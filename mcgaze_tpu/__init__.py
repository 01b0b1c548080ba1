"""mcgaze_tpu: TPU-native video gaze estimation (MCGaze capabilities,
rebuilt on JAX/XLA/pjit + a native C++ data runtime).

Public surface:
    ModelConfig, MCGazeModel, init_model      — the flagship model family
    OptimConfig, create_train_state, make_train_step — training
    VideoGazeEvaluator, EvalConfig            — batched clip evaluation
    gaze_error, evaluate_results              — offline MAE scoring
    load_config                               — native + legacy configs
"""
__version__ = '0.1.0'

from .evaluation.driver import EvalConfig, VideoGazeEvaluator  # noqa: F401
from .evaluation.mae import evaluate_results, gaze_error  # noqa: F401
from .models.mcgaze import MCGazeModel, ModelConfig, init_model  # noqa: F401
from .train.loop import (OptimConfig, create_train_state,  # noqa: F401
                         make_train_step)
from .utils.config import Config, load_config  # noqa: F401
