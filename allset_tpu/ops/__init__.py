from allset_tpu.ops.segment import (  # noqa: F401
    gather_rows,
    propagate,
    segment_count,
    segment_max,
    segment_mean,
    segment_reduce,
    segment_softmax,
    segment_sum,
)
