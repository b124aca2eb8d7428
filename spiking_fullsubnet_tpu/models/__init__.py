"""Model library (maps reference layer 2, audiozen/models/)."""

from .sequence_model import (
    SequenceModelConfig,
    sequence_model_init,
    sequence_model_apply,
    subband_sequence_model_apply,
)
from .spiking_fullsubnet import (
    SpikingFullSubNetConfig,
    spiking_fullsubnet_init,
    spiking_fullsubnet_apply,
    separator_config,
)
from .cirm_models import CirmModelConfig, cirm_model_init, cirm_model_apply
from .fullsubnet import FullSubNetConfig, fullsubnet_init, fullsubnet_apply
from .conv_tasnet import ConvTasNetConfig, conv_tasnet_init, conv_tasnet_apply, conv_tasnet_base
from .discriminator import discriminator_init, discriminator_apply
from .rnn_sequence_model import (
    RnnSequenceModelConfig,
    rnn_sequence_model_init,
    rnn_sequence_model_apply,
)
