from neuralmelting_tpu.sampler.state import MCState, init_state  # noqa: F401
