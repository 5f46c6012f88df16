"""Property-based differential: the streaming sessionize fold
(``streaming/sessionize.py:_make_fn``) vs the batch twin's gap
algorithm (the ``sessionize`` contract query's lag + cumulative-sum
semantics), driven as a PURE FUNCTION with a fake GroupState — no
Spark session, so hypothesis can run hundreds of randomized
micro-batch schedules in seconds.

The module docstring pins the equivalence contract:

- when events arrive in time order across micro-batches (no event
  older than an already-emitted session), the union of emitted
  sessions + the final open state equals the batch sessionization
  EXACTLY — property 1;
- with the idle-timeout flush the final open session is emitted too,
  so emitted alone equals the batch answer — property 2;
- under ARBITRARY (adversarially late) batch assignment exactness is
  impossible in append mode, but event count is conserved, null
  timestamps are dropped, and every emitted session is internally
  gap-consistent — property 3.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
import pandas as pd

from table_ocr_spark.streaming.sessionize import _make_fn

GAP_US = 1_000  # small gap so random event sets straddle it often
KEY = (7,)


class FakeState:
    """The four GroupState members the fold consumes."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None, "fold read state without exists check"
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _ts_frame(us_list):
    # None -> NaT, mirroring a null ts column
    return pd.DataFrame(
        {"ts": pd.to_datetime(pd.Series(us_list, dtype="object"), unit="us")}
    )


def _drive(batches, gap_us, idle_flush):
    """Run the fold over micro-batches; returns (emitted, open_state).
    ``idle_flush`` additionally simulates the engine's timed-out
    invocation (empty data iterator, hasTimedOut set) at stream end."""
    fn = _make_fn(gap_us, 60_000 if idle_flush else None)
    state = FakeState()
    emitted = []
    for batch in batches:
        for pdf in fn(KEY, iter([_ts_frame(batch)]), state):
            for r in pdf.itertuples(index=False):
                emitted.append(
                    (
                        r.session_start.value // 1000,
                        r.session_end.value // 1000,
                        int(r.n_events),
                    )
                )
    if idle_flush:
        assert state.timeout_ms == 60_000 or state._v is None
        state.hasTimedOut = True
        for pdf in fn(KEY, iter([]), state):
            for r in pdf.itertuples(index=False):
                emitted.append(
                    (
                        r.session_start.value // 1000,
                        r.session_end.value // 1000,
                        int(r.n_events),
                    )
                )
        assert state._v is None, "idle flush must drop the state"
    return emitted, state._v


def _batch_sessions(all_us, gap_us):
    """Reference implementation: the batch twin's gap fold."""
    ts = sorted(t for t in all_us if t is not None)
    out = []
    for t in ts:
        if out and t - out[-1][1] <= gap_us:
            out[-1][1] = t
            out[-1][2] += 1
        else:
            out.append([t, t, 1])
    return [tuple(s) for s in out]


# event times in a window a few gaps wide, so sessions split and merge
_event_times = st.lists(
    st.integers(min_value=0, max_value=8 * GAP_US), min_size=0, max_size=60
)
_cut_fracs = st.lists(
    st.floats(min_value=0.0, max_value=1.0), min_size=0, max_size=6
)


def _contiguous_split(times, fracs):
    ts = sorted(times)
    cuts = sorted({int(f * len(ts)) for f in fracs})
    batches, prev = [], 0
    for c in cuts + [len(ts)]:
        batches.append(ts[prev:c])  # empty batches are legal micro-batches
        prev = c
    return batches


@settings(max_examples=300, deadline=None)
@given(_event_times, _cut_fracs)
def test_time_ordered_batches_match_batch_twin_exactly(times, fracs):
    batches = _contiguous_split(times, fracs)
    emitted, open_state = _drive(batches, GAP_US, idle_flush=False)
    expected = _batch_sessions(times, GAP_US)
    got = list(emitted)
    if open_state is not None:
        got.append(tuple(int(x) for x in open_state))
    assert got == expected


@settings(max_examples=300, deadline=None)
@given(_event_times, _cut_fracs)
def test_idle_flush_emits_exactly_the_batch_answer(times, fracs):
    batches = _contiguous_split(times, fracs)
    emitted, open_state = _drive(batches, GAP_US, idle_flush=True)
    assert open_state is None
    assert emitted == _batch_sessions(times, GAP_US)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=8 * GAP_US)),
            st.integers(min_value=0, max_value=4),  # batch assignment
        ),
        max_size=60,
    )
)
def test_adversarial_lateness_conserves_events(assigned):
    """Arbitrary (late-across-batches) assignment: exact equality is
    impossible in append mode, but the fold must (a) conserve the
    non-null event count across emitted + open, (b) drop null ts,
    (c) emit only internally consistent sessions, and (d) keep the
    sessions emitted WITHIN one invocation gap-separated and ordered
    (they come from a single interval-merge fold)."""
    batches = [[] for _ in range(5)]
    for t, b in assigned:
        batches[b].append(t)
    fn = _make_fn(GAP_US, None)
    state = FakeState()
    emitted_runs = []
    for batch in batches:
        run = []
        for pdf in fn(KEY, iter([_ts_frame(batch)]), state):
            for r in pdf.itertuples(index=False):
                run.append(
                    (
                        r.session_start.value // 1000,
                        r.session_end.value // 1000,
                        int(r.n_events),
                    )
                )
        emitted_runs.append(run)
    n_expected = sum(1 for t, _ in assigned if t is not None)
    n_got = sum(s[2] for run in emitted_runs for s in run)
    if state._v is not None:
        n_got += state._v[2]
    assert n_got == n_expected
    for run in emitted_runs:
        for s, e, c in run:
            assert s <= e and c >= 1
        for (s1, e1, _), (s2, e2, _) in zip(run, run[1:]):
            assert s2 - e1 > GAP_US, "same-fold sessions must be gap-split"
