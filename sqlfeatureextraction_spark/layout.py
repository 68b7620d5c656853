"""Fixed-width feature-vector layout registry.

The reference derives its bit layout implicitly from vocabulary files
and hard-coded segment order (enc/APMFragmentIntent.java:720-750:
time ‖ projection ‖ avg ‖ min ‖ max ‖ sum ‖ where ‖ groupBy ‖ orderBy ‖
timeOffset ‖ timeRange ‖ granularity).  We make the layout an explicit,
testable object so segment widths/order are pinned by tests
(SURVEY §5 test plan item c).

Per-turn vector segments (transcript domain):
  time  : 7 day-of-week + 24 hour-of-day one-hot            (31)
  role  : one-hot over fitted role values                    (|R|)
  tool  : one-hot over fitted tool values                    (|T|)
  bow   : bag-of-token presence/count over fitted vocabulary (|V|)
  lag   : trailing-gap buckets over granularities            (|G|)
          bit i set iff lag_sec >= granularities[i]; first turn of a
          conversation (null lag) sets ALL lag bits (reference null ⇒
          all ones, enc/APMFragmentIntent.java:791-802)

Window vector (per conv_id × ts):
  tool_intent : one-hot of the top-K tools present            (|T|)
  slots       : top_k_entities × top_n_members × turn_width, each slot
                the member's per-turn vector, cost-desc order,
                zero-padded (enc/APMWindowFragmentIntent.java:422-493)
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Segment:
    name: str
    offset: int
    width: int


@dataclass(frozen=True)
class VectorLayout:
    segments: tuple[Segment, ...]

    @property
    def width(self) -> int:
        return sum(s.width for s in self.segments)

    def seg(self, name: str) -> Segment:
        for s in self.segments:
            if s.name == name:
                return s
        raise KeyError(name)

    @staticmethod
    def build(n_roles: int, n_tools: int, n_tokens: int, n_grans: int) -> "VectorLayout":
        widths = [
            ("time", 31),
            ("role", n_roles),
            ("tool", n_tools),
            ("bow", n_tokens),
            ("lag", n_grans),
        ]
        segs, off = [], 0
        for name, w in widths:
            segs.append(Segment(name, off, w))
            off += w
        return VectorLayout(tuple(segs))


def window_vector_width(layout: VectorLayout, top_k: int, top_n: int) -> int:
    """tool_intent(|T|) + top_k × top_n × turn_width
    (length formula logged by the reference at
    enc/APMWindowFragmentIntent.java:487-490)."""
    return layout.seg("tool").width + top_k * top_n * layout.width
