from . import mesh
from . import loader
