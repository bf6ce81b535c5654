from .hybrid import EncoderSVGP  # noqa: F401
from .rnn import MaskedRNN  # noqa: F401
from .svgp import SVGP  # noqa: F401
