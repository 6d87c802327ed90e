from yolov6_tpu.quant.fake_quant import (  # noqa: F401
    QuantState,
    fake_quant,
    fake_quant_per_channel,
    quant_state,
    quantize_conv_params,
    set_quant_mode,
)
