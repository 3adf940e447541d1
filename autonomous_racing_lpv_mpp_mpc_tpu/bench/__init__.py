from .presets import PRESETS, run_preset

__all__ = ["PRESETS", "run_preset"]
