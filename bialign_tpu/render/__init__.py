from . import decode, plot
from .decode import (
    NL_ROW,
    OUTMODES,
    auto_complete,
    decode_trace,
    decode_trace_full,
    shift_string,
    transfer_gaps,
)
from .plot import breaklines, fourway_from_full, plot_alignment, runs

__all__ = [
    "decode",
    "plot",
    "NL_ROW",
    "OUTMODES",
    "auto_complete",
    "decode_trace",
    "decode_trace_full",
    "shift_string",
    "transfer_gaps",
    "breaklines",
    "fourway_from_full",
    "plot_alignment",
    "runs",
]
