from allset_tpu.graph.incidence import Incidence, pad_bucket  # noqa: F401
from allset_tpu.graph.transforms import (  # noqa: F401
    HyperData,
    add_self_loops,
    coalesce,
    construct_h_dense,
    construct_v2v,
    expand_edge_index,
    gcn_norm,
    generate_g_from_h,
    generate_norm_hnhn,
    hypergcn_edge_dict,
    norm_construction,
    rand_train_test_idx,
    unignn_degrees,
)
