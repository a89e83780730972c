from .model import SourceModel, compute_domain_coords_linearinterp
from .filter import butterworth_filter_signal
from .slip import compute_source_function
