"""visdial-tpu: TPU-native Visual Dialog training/eval stack.

A ground-up JAX/XLA/Pallas/pjit rebuild with the capabilities of
batra-mlp-lab/visdial (Das et al., CVPR 2017).  See SURVEY.md for the
reference blueprint and README.md for usage.
"""

from .config import Config, DECODERS, ENCODERS

__version__ = "0.1.0"
__all__ = ["Config", "ENCODERS", "DECODERS"]
