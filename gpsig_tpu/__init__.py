"""gpsig-tpu: TPU-native Gaussian processes with signature covariances.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of tgcsaba/GPSig
(Bayesian learning on sequential data with truncated signature kernels),
designed TPU-first: pure-function kernels over parameter pytrees, fused
Pallas Gram kernels, pjit/shard_map scale-out, optax training.
"""

from . import config, params  # noqa: F401
from . import ops  # noqa: F401
from . import kernels, likelihoods, linalg, inducing, training  # noqa: F401
from . import checkpoint, kconv, mean_functions, metrics, profiling, serving, vector_kernels  # noqa: F401
from . import preprocessing, utils  # noqa: F401
from . import models, parallel  # noqa: F401
from .inducing import InducingSequences, InducingTensors  # noqa: F401
from .models import SVGP  # noqa: F401

# datasets is imported lazily by callers (pulls scipy only when used)

__version__ = "0.3.0"
