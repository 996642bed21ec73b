"""Engine configuration: the reference's hard-coded model constants.

Every literal baked into the reference implementation
(SURVEY.md §1.4) is a named config here so queries parameterize
instead of re-hard-coding:

- portfolio weights  — reference StreamingJob.java:85 / psd.R:21
- window size/slide  — reference StreamingJob.java:435 (countWindowAll(30, 1))
- alert threshold    — reference StreamingJob.java:369-385 ((ref-m)/(1+ref) >= 0.01)
- tail fraction      — reference StreamingJob.java:90-91 (n/10 smallest)
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: Canonical measure names, in the reference's emission order
#: (reference StreamingJob.java:369-385; postProcessing/countWarnings.py:17).
MEASURES: tuple[str, ...] = (
    "mean",
    "median",
    "q10",
    "tail_mean",
    "sm1",
    "sm2",
)


@dataclass(frozen=True)
class EngineConfig:
    """Tunable semantics of the risk pipeline."""

    #: Per-asset portfolio weights (reference StreamingJob.java:85).
    weights: tuple[float, ...] = (0.2, 0.2, 0.2, 0.15, 0.15, 0.1)
    #: Sliding count-window size (reference StreamingJob.java:435).
    window_size: int = 30
    #: Window slide in rows.
    window_slide: int = 1
    #: Relative shortfall that triggers an alert
    #: (reference StreamingJob.java:369-385).
    alert_threshold: float = 0.01
    #: Tail fraction for q10 / tail-mean (n/10 smallest; reference
    #: StreamingJob.java:90-91,190-196).
    tail_fraction: int = 10
    #: Decimal digits kept on emitted measure values before the alert
    #: predicate — pins float-summation noise so batch, streaming, and
    #: oracle paths agree bit-for-bit.
    measure_round_digits: int = 9

    series_names: tuple[str, ...] = field(
        default=("r1", "r2", "r3", "r4", "r5", "r6"), repr=False
    )


DEFAULT_CONFIG = EngineConfig()
