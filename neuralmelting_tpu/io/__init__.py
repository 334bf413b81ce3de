from neuralmelting_tpu.io.naming import sample_prefix  # noqa: F401
from neuralmelting_tpu.io import thermo, traj  # noqa: F401
