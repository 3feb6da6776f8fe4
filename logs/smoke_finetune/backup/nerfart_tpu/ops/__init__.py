from nerfart_tpu.ops.embedder import fourier_embed, embed_dim
from nerfart_tpu.ops.rays import (
    lift,
    get_rays,
    near_far_from_sphere,
    get_sphere_intersection,
    get_dvals_from_radius,
    lin2img,
)
from nerfart_tpu.ops.sampling import sample_pdf, sample_cdf
from nerfart_tpu.ops.compositing import (
    volsdf_integrate,
    alpha_to_w,
    weighted_normal_map,
)
from nerfart_tpu.ops.volsdf_math import (
    sdf_to_sigma,
    error_bound,
    opacity_invert_cdf_sample,
    fine_sample,
)
from nerfart_tpu.ops.neus_math import (
    cdf_Phi_s,
    sdf_to_alpha,
    sdf_to_w,
    neus_upsample,
)
