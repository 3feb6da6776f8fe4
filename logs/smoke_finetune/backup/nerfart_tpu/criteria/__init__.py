from nerfart_tpu.criteria.losses import (
    TextBank,
    PatchNCECfg,
    encode_templates,
    compute_text_direction,
    directional_clip_loss,
    vgg_perceptual_loss,
    global_contrastive_loss,
    patchnce_loss,
    infonce_loss,
    weights_loss,
    weights_sum_loss,
    weights_reg_loss,
)
from nerfart_tpu.criteria.neg_text import create_fine_neg_texts, parse_neg_text
from nerfart_tpu.criteria.style import StyleCfg, style_loss
