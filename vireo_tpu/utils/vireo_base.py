"""Migration alias: `vireoSNP.utils.vireo_base` -> vireo_tpu kernels."""
from ..base import *  # noqa: F401,F403
