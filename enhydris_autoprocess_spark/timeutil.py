"""Time-step literal parsing and bucket arithmetic.

The reference accepts step strings of the form ``<number?><unit>`` with
units ``min, H, D, M, Y`` for aggregation steps
(/root/reference/enhydris_autoprocess/models.py:380-387) and
``min, H, D`` for rate-of-change ``delta_t``
(models.py:262-268, regex ``(\\d+)(\\w+)``); the resulting-timestamp
offset is ``-?<number?>min`` (models.py:457-465).

Calendar steps (M, Y) are parsed but the reference's own pipeline
rejects them at regularization time (tests/test_models.py:1047-1084
error message: "... Only time steps specified in minutes, hours or days
are supported."); we keep the same behavior for the pipeline and expose
calendar bucketing only through the extended aggregate API.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_STEP_RE = re.compile(r"^(\d*)(min|H|D|M|Y)$")
_DELTA_T_RE = re.compile(r"(\d+)(\w+)")
_OFFSET_RE = re.compile(r"(-?)(\d*)(.*)$")

_UNIT_SECONDS = {"min": 60, "H": 3600, "D": 86400}

MICROS = 1_000_000


class StepError(ValueError):
    """Raised for malformed or unsupported time-step literals."""


@dataclass(frozen=True)
class Step:
    """A parsed time step. ``seconds`` is None for calendar steps."""

    n: int
    unit: str  # min | H | D | M | Y

    @property
    def is_calendar(self) -> bool:
        return self.unit in ("M", "Y")

    @property
    def seconds(self) -> int:
        if self.is_calendar:
            raise StepError(
                "The time step is malformed or is specified in months. Only "
                "time steps specified in minutes, hours or days are supported."
            )
        return self.n * _UNIT_SECONDS[self.unit]

    @property
    def micros(self) -> int:
        return self.seconds * MICROS

    def __str__(self) -> str:
        return f"{self.n}{self.unit}"


def parse_step(step: str) -> Step:
    """Parse ``"10min" / "H" / "1D" / "M" / "Y"``.

    A missing leading number means 1, mirroring
    models.py:502-506 (``_get_target_step`` prepends "1").
    """
    m = _STEP_RE.match(step or "")
    if not m:
        raise StepError(f'"{step}" is not a valid time step')
    n = int(m.group(1)) if m.group(1) else 1
    if n == 0:
        raise StepError(f'"{step}" is not a valid time step')
    return Step(n, m.group(2))


def is_delta_t_valid(delta_t: str) -> bool:
    """Validation rule of RateOfChangeThreshold.is_delta_t_valid
    (models.py:262-268): ``<nonzero int><min|H|D>``."""
    m = _DELTA_T_RE.match(delta_t or "")
    return bool(m and int(m.group(1)) and m.group(2) in ("min", "H", "D"))


def parse_delta_t_seconds(delta_t: str) -> int:
    if not is_delta_t_valid(delta_t):
        raise StepError(f'"{delta_t}" is not a valid delta_t')
    m = _DELTA_T_RE.match(delta_t)
    return int(m.group(1)) * _UNIT_SECONDS[m.group(2)]


def parse_offset_minutes(offset: str | None) -> int:
    """Parse a resulting-timestamp offset into minutes.

    Mirrors models.py:457-465: optional ``-``, optional digits, unit must
    be ``min``; a bare ``-`` with no digits is invalid; empty/None -> 0.
    ``"min"`` alone means 1 minute (pd.Timedelta("min") == 1 minute).
    """
    if not offset:
        return 0
    m = _OFFSET_RE.match(offset)
    sign, number, unit = m.group(1, 2, 3)
    if unit != "min" or (sign == "-" and number == ""):
        raise StepError(f'"{offset}" is not a valid resulting time step offset.')
    value = int(number) if number else 1
    return -value if sign == "-" else value


def step_ratio(source: Step, target: Step) -> int:
    """``int(Timedelta(target) / to_offset(source))`` of models.py:508-511."""
    return int(target.seconds // source.seconds)
