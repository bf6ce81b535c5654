from .train_gpsig import train_gpsig_classifier  # noqa: F401
from .train_gpsigrnn import train_gpsigrnn_classifier  # noqa: F401
from .train_gprnn import train_gprnn_classifier  # noqa: F401
from .train_gpkconv1d import train_gpkconv1d_classifier  # noqa: F401
