"""Migration alias: `vireoSNP.utils.vireo_doublet` -> models.doublet/ambient."""
from ..models.doublet import (predict_doublet, add_doublet_theta,  # noqa: F401
                              add_doublet_GT)
from ..models.ambient import predit_ambient  # noqa: F401
