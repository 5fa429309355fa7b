from . import attention, linear, norm, quant, rope, sampling_ops  # noqa: F401
