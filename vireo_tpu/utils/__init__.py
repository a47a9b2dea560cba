from . import checkpoint
from . import timing
