"""vinsat_tpu: a TPU-native satellite visual-inertial orbit-determination engine.

Built from scratch in JAX/XLA/Pallas with the full capability surface of
CMUAbstract/VINSat (see SURVEY.md for the reference analysis).
"""

__version__ = "0.1.0"

from vinsat_tpu.config import (  # noqa: F401
    DEFAULT_CONFIG,
    CameraConfig,
    DynamicsConfig,
    GatingConfig,
    InitNoiseConfig,
    PipelineConfig,
    SimConfig,
    SolverConfig,
    WindowConfig,
)
