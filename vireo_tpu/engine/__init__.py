from . import wrap
