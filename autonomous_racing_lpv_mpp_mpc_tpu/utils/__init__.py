from .metrics import LapStats, lap_stats
from .record import save_log, load_log, SweepCheckpoint
from .profiling import timed, trace_to, cost_analysis
from .debug import enable_nan_debugging, checked_closed_loop
from .plotting import plot_track, plot_run, plot_predictions, animate_run

__all__ = [
    "SweepCheckpoint",
    "plot_track",
    "plot_run",
    "plot_predictions",
    "animate_run",
    "LapStats",
    "lap_stats",
    "save_log",
    "load_log",
    "timed",
    "trace_to",
    "cost_analysis",
    "enable_nan_debugging",
    "checked_closed_loop",
]
