from neuralmelting_tpu.neural.scalers import get_scaler  # noqa: F401
from neuralmelting_tpu.neural.models import PhaseCNN, PhaseMLP  # noqa: F401
from neuralmelting_tpu.neural.train import train_classifier  # noqa: F401
from neuralmelting_tpu.neural.melt import fit_melting_temperature  # noqa: F401
