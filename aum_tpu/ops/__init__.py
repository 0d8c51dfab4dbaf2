from aum_tpu.ops.scan_ref import selective_scan_ref
from aum_tpu.ops.selective_scan import selective_scan
from aum_tpu.ops.conv1d import (causal_conv1d, causal_conv1d_update,
                                causal_conv1d_xla)
from aum_tpu.ops.norms import rms_norm, layer_norm, fused_add_norm
from aum_tpu.ops.seq_parallel import make_sharded_scan, seq_parallel_scan
from aum_tpu.ops.state_update import selective_state_update

__all__ = [
    "selective_scan_ref",
    "selective_scan",
    "seq_parallel_scan",
    "make_sharded_scan",
    "causal_conv1d",
    "causal_conv1d_update",
    "causal_conv1d_xla",
    "rms_norm",
    "layer_norm",
    "fused_add_norm",
    "selective_state_update",
]
