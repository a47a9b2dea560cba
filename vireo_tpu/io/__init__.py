from . import vcf
from . import matrices
