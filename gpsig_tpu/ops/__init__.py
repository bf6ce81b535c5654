from . import base_kernels, lags, low_rank, signature  # noqa: F401
