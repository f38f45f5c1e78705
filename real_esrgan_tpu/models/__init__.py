from real_esrgan_tpu.models.rrdbnet import (
    Generator, ResidualDenseBlock, RRDB, TrunkFeatures, trunk_feature_params,
)
from real_esrgan_tpu.models.discriminator import UNetDiscriminator
from real_esrgan_tpu.models.ema import ema_init, ema_update
from real_esrgan_tpu.models.vgg import VGG19Features, ContentLoss
