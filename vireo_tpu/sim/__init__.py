from . import synth
from . import pool_bam
