from allset_tpu.models.setgnn import SetGNN, SetGNNConfig  # noqa: F401
