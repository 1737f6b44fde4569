"""Training/eval engine (the reference's L6 layer, run_rnnt.py:233-441)."""

from rnnt_tpu.train.state import TrainState, create_train_state  # noqa: F401
from rnnt_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
