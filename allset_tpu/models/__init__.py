from allset_tpu.models.cegnn import CEGAT, CEGCN, CEConfig, GATConv, GCNConv  # noqa: F401
from allset_tpu.models.hcha import HCHA, HCHAConfig, HypergraphConv  # noqa: F401
from allset_tpu.models.hnhn import HNHN, HNHNConfig, HNHNConv  # noqa: F401
from allset_tpu.models.hypergcn import (  # noqa: F401
    HyperGCN,
    HyperGCNConfig,
    build_hypergcn_laplacian,
)
from allset_tpu.models.legacy_hgnn import (  # noqa: F401
    LegacyHGNN,
    LegacyHGNNConfig,
    MLPConfig,
    MLPModel,
)
from allset_tpu.models.setgnn import SetGNN, SetGNNConfig  # noqa: F401
from allset_tpu.models.unignn import (  # noqa: F401
    UniGCNII,
    UniGCNIIConfig,
    UniGNN,
    UniGNNConfig,
)
