from .base_plot import heat_matrix, plot_GT, minicode_plot, anno_heat
from .base_plot import vireo_colors
