"""Migration alias: `vireoSNP.utils.variant_select` -> models.variant_select."""
from ..models.variant_select import (barcode_entropy, variant_select,  # noqa: F401
                                     variant_ELBO_gain)
