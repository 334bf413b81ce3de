from neuralmelting_tpu.utils.metrics import MetricsLogger  # noqa: F401
from neuralmelting_tpu.utils.timing import DeviceTimer  # noqa: F401
