"""TPU-native graph primitives: dense batched message passing, masked
attention normalization, importance masking.

Everything here is shape-static and jit/vmap-friendly; the hot ops are
formulated as dense (B, N, N) einsums so XLA tiles them onto the MXU.
"""

from iggcn_tpu.ops.gcn import (  # noqa: F401
    gcn_propagation_matrix,
    dense_edge_mask,
    gcn_conv,
)
from iggcn_tpu.ops.masking import (  # noqa: F401
    importance_masks,
    edge_probability_dense,
)
from iggcn_tpu.ops.attention import multihead_cross_attention  # noqa: F401
