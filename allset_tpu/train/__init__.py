from allset_tpu.train.trainer import (  # noqa: F401
    Results,
    TrainConfig,
    Trainer,
    masked_acc,
    masked_nll,
    torch_adam,
)
