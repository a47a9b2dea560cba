from . import math
from . import counts
from . import matching
