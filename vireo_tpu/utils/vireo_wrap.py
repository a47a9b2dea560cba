"""Migration alias: `vireoSNP.utils.vireo_wrap` -> engine.wrap."""
from ..engine.wrap import vireo_wrap  # noqa: F401
