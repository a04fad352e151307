"""SLAM system state machine (reference: visual_slam/state.py:4-60)."""
from __future__ import annotations

import enum


class State(enum.Enum):
    """Pipeline states, matching the reference's 8-state machine
    (state.py:31-41)."""

    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    INITIALIZING = 2
    OK = 3
    LOST = 4
    RELOCALIZING = 5
    MAPPING = 6
    LOOP_CLOSING = 7

    @property
    def index(self) -> int:
        return self.value

    @property
    def description(self) -> str:
        return _DESCRIPTIONS[self]

    @classmethod
    def by_index(cls, idx: int) -> "State":
        """(reference state.py:55-60)"""
        return cls(idx)


_DESCRIPTIONS = {
    State.NO_IMAGES_YET: "No images received yet",
    State.NOT_INITIALIZED: "Map not initialized",
    State.INITIALIZING: "Two-view initialization in progress",
    State.OK: "Tracking nominal",
    State.LOST: "Tracking lost",
    State.RELOCALIZING: "Relocalization in progress",
    State.MAPPING: "Local mapping in progress",
    State.LOOP_CLOSING: "Loop closing in progress",
}
