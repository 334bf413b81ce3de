from neuralmelting_tpu.models.lattice import make_supercell  # noqa: F401
from neuralmelting_tpu.models.lj import LJCut  # noqa: F401
