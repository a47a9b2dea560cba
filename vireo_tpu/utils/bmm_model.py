"""Migration alias: `vireoSNP.utils.bmm_model` -> models.bmm."""
from ..models.bmm import BinomMixtureVB  # noqa: F401
