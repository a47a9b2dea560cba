from . import wrap
from . import select
