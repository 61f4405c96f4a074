"""Analysis driver: iterate registered members, dispatching their
bootstrap/init/precompute/compute/write hooks on per-member alarms
(reference mpas_seaice_analysis_driver.F: member list :150-168, hook
dispatch :410-560).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..forcing.clock import Alarm, ModelClock


class AnalysisMember:
    """Base class; members override the hooks they need (the reference's
    function-pointer table)."""

    name = "template"

    def __init__(self, compute_interval: float = 86400.0,
                 write_interval: Optional[float] = None):
        self.compute_alarm = Alarm(compute_interval)
        self.write_alarm = Alarm(write_interval or compute_interval)
        self.results: Dict[str, Any] = {}
        self.last_diags: Optional[Dict[str, Any]] = None

    # hooks (reference :43-52)
    def bootstrap(self, model, state):
        pass

    def init(self, model, state):
        pass

    def precompute(self, model, state, clock: ModelClock):
        pass

    def compute(self, model, state, clock: ModelClock) -> Dict[str, Any]:
        return {}

    def write(self, stream, clock: ModelClock):
        if stream is not None and self.results:
            numeric = {k: v for k, v in self.results.items()
                       if hasattr(v, "shape") or isinstance(
                           v, (int, float))}
            if numeric:
                stream.write(numeric, clock.timestamp())


class AnalysisDriver:
    """Owns the member list; called from the run loop each step."""

    def __init__(self, members: List[AnalysisMember],
                 stream=None):
        self.members = members
        self.stream = stream

    def bootstrap(self, model, state):
        for m in self.members:
            m.bootstrap(model, state)

    def init(self, model, state):
        for m in self.members:
            m.init(model, state)

    def on_timestep(self, model, state, clock: ModelClock,
                    diags: Optional[Dict[str, Any]] = None):
        """precompute -> compute -> write, alarm-gated per member
        (reference timeLoop integration :321-331).  diags: the step's
        diagnostics dict (ridging rates, column fluxes, ...), stored on
        each member as `last_diags` for members that consume them."""
        for m in self.members:
            m.last_diags = diags
            m.precompute(model, state, clock)
            if m.compute_alarm.is_ringing(clock):
                m.results = m.compute(model, state, clock) or {}
            if m.write_alarm.is_ringing(clock):
                m.write(self.stream, clock)

    def result(self, member_name: str) -> Dict[str, Any]:
        for m in self.members:
            if m.name == member_name:
                return m.results
        raise KeyError(member_name)
