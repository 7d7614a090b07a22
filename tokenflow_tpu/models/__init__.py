from tokenflow_tpu.models.unet2d import UNet2DConfig, UNet2DConditionModel
from tokenflow_tpu.models.vae import AutoencoderKLConfig, AutoencoderKL
from tokenflow_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
