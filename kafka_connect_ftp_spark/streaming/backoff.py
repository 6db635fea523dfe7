"""Exponential backoff for failed polls.

Same contract as the reference's ExponentialBackOff.scala:5-22: the wait
interval is ``min(cap, step * 2^failures)``, reset on success, doubled per
consecutive failure. Re-expressed time-injectable for tests (the reference
reads Instant.now internally).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field


@dataclass
class ExponentialBackOff:
    step_seconds: float
    cap_seconds: float
    clock: callable = field(default=_time.monotonic)

    def __post_init__(self) -> None:
        self._failures = 0
        self._end = self.clock()  # first attempt allowed immediately

    @property
    def interval_seconds(self) -> float:
        return min(self.cap_seconds, self.step_seconds * (2**self._failures))

    def passed(self) -> bool:
        return self.clock() >= self._end

    def next_success(self) -> None:
        self._failures = 0
        self._end = self.clock() + self.interval_seconds

    def reset(self) -> None:
        """Clear failures and open the gate immediately — for callers whose
        cadence is paced elsewhere (e.g. a streaming trigger), where
        ``next_success``'s post-poll wait window would double-gate."""
        self._failures = 0
        self._end = self.clock()

    def next_failure(self) -> None:
        self._failures += 1
        self._end = self.clock() + self.interval_seconds

    def remaining_seconds(self) -> float:
        return max(0.0, self._end - self.clock())
