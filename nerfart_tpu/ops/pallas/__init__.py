from nerfart_tpu.ops.pallas.fused_mlp import (
    fused_implicit_surface_fwd,
    fused_sdf_forward,
    prepare_weights,
)
