"""NN primitives: recurrence, convs, norms, complex ops, attention, TCMs."""

from se_tpu.nn.recurrent import LSTM, lstm_layer  # noqa: F401
from se_tpu.nn.conv import (  # noqa: F401
    Conv2d,
    ConvTranspose2d,
    GluConv2d,
    GluConvTranspose2d,
)
from se_tpu.nn.norms import (  # noqa: F401
    BatchNorm,
    LayerNorm,
    InstanceNorm2d,
    CumulativeLayerNorm1d,
    CumulativeLayerNorm2d,
    SeqCausalLayerNorm,
    SeqLayerNorm,
    FrameLayerNorm,
    deepxi_normalisation,
)
