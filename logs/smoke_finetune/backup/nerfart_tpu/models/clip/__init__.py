from nerfart_tpu.models.clip.model import (
    CLIPCfg,
    VIT_B_32,
    CLIP_MEAN,
    CLIP_STD,
    encode_image,
    encode_text,
    init_clip_params,
    load_clip_params,
    params_from_openai_state_dict,
)
from nerfart_tpu.models.clip.tokenizer import SimpleTokenizer, default_bpe_path
