from allset_tpu.nn.modules import (  # noqa: F401
    MLP,
    PMA,
    HalfNLHconv,
    NormLayer,
    TorchDense,
)
