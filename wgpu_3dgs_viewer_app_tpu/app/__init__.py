from .persistence import load_compressions, restore_state, save_state
from .export import ExportChoice, export_models
from .loader import Loadable, StreamingLoader
from .measurement import (
    Measurement,
    MeasurementHit,
    MeasurementHitPair,
    render_measurement_overlay,
)
from .state import (
    Action,
    FpsCounter,
    GaussianSplattingSession,
    MaskState,
    SceneCommand,
    SceneCommandKind,
    Selection,
    SelectionEdit,
    SelectionMethod,
)

__all__ = [
    "ExportChoice",
    "export_models",
    "Loadable",
    "StreamingLoader",
    "Measurement",
    "MeasurementHit",
    "MeasurementHitPair",
    "render_measurement_overlay",
    "Action",
    "FpsCounter",
    "GaussianSplattingSession",
    "MaskState",
    "SceneCommand",
    "SceneCommandKind",
    "Selection",
    "SelectionEdit",
    "SelectionMethod",
    "load_compressions",
    "restore_state",
    "save_state",
]
