"""Engine tests for gap-based sessionization (operators/sessions.py):
boundary semantics, per-user independence, and lag-form ≡ native
session_window cross-consistency."""

import datetime as dt

from crawld_spark.operators import sessions


def _df(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


T0 = dt.datetime(2024, 1, 1)


def _at(s):
    return T0 + dt.timedelta(seconds=s)


class TestSessionize:
    def test_boundary_exact_gap_merges(self, spark):
        # gap = 10 s: diff == 10 merges (session_window semantics), > 10 breaks
        rows = [(1, 7, _at(0)), (2, 7, _at(10)), (3, 7, _at(21))]
        got = {
            r.event_id: (r.session_seq, r.event_seq)
            for r in sessions.sessionize(_df(spark, rows), gap_s=10).collect()
        }
        assert got == {1: (0, 0), 2: (0, 1), 3: (1, 0)}

    def test_users_independent(self, spark):
        rows = [(1, 1, _at(0)), (2, 2, _at(5)), (3, 1, _at(100)), (4, 2, _at(6))]
        got = {
            r.event_id: (r.user_id, r.session_seq)
            for r in sessions.sessionize(_df(spark, rows), gap_s=10).collect()
        }
        assert got[1] == (1, 0) and got[3] == (1, 1)  # user 1: two sessions
        assert got[2] == (2, 0) and got[4] == (2, 0)  # user 2: one

    def test_simultaneous_events_tiebreak_by_id(self, spark):
        rows = [(5, 1, _at(0)), (4, 1, _at(0)), (6, 1, _at(1))]
        got = {
            r.event_id: r.event_seq
            for r in sessions.sessionize(_df(spark, rows), gap_s=10).collect()
        }
        assert got == {4: 0, 5: 1, 6: 2}


class TestSessionRollup:
    def test_native_equals_lag_derived(self, spark):
        # irregular pattern across 3 users; rollup from the native
        # session_window must equal the rollup derived from sessionize
        rows = []
        eid = 0
        for u in (1, 2, 3):
            t = 0
            for step in (0, 5, 12, 3, 40, 1, 11, 2):
                t += step * u
                rows.append((eid, u, _at(t)))
                eid += 1
        df = _df(spark, rows)
        native = {
            (r.user_id, r.start_us): (r.end_us, r.n_events, r.duration_us)
            for r in sessions.session_rollup(df, gap_s=10).collect()
        }
        ev = sessions.sessionize(df, gap_s=10).collect()
        derived = {}
        for r in ev:
            key = (r.user_id, r.session_seq)
            lo, hi, n = derived.get(key, (r.ts_us, r.ts_us, 0))
            derived[key] = (min(lo, r.ts_us), max(hi, r.ts_us), n + 1)
        want = {
            (u, lo): (hi, n, hi - lo) for (u, _), (lo, hi, n) in derived.items()
        }
        assert native == want

    def test_singleton_sessions(self, spark):
        rows = [(1, 1, _at(0)), (2, 1, _at(1000))]
        got = sessions.session_rollup(_df(spark, rows), gap_s=10).collect()
        assert len(got) == 2
        assert all(r.n_events == 1 and r.duration_us == 0 for r in got)


class TestSessionsRandomized:
    """Randomized differential check: sessionize AND the native
    session_window rollup vs a pure-Python reference over dense random
    timelines (gaps straddling the threshold, duplicate timestamps,
    many users — the regime hand cases can't cover)."""

    GAP = 30

    def _events(self):
        import random

        rng = random.Random(987)
        rows = []
        eid = 0
        for u in range(8):
            t = 0
            for _ in range(rng.randint(0, 40)):
                # gaps cluster around the threshold; duplicates included
                t += rng.choice([0, 1, 5, 29, 30, 31, 45, 90])
                rows.append((eid, u, _at(t)))
                eid += 1
        return rows

    def _reference(self, rows):
        # per-user: sort by (ts, id); break when diff > GAP
        by_user: dict[int, list] = {}
        for eid, u, ts in rows:
            by_user.setdefault(u, []).append((int(ts.timestamp() * 1_000_000), eid))
        ref_events = {}
        ref_sessions = {}
        for u, evs in by_user.items():
            evs.sort()
            seq = -1
            prev = None
            pos = 0
            for ts_us, eid in evs:
                if prev is None or ts_us - prev > self.GAP * 1_000_000:
                    seq += 1
                    pos = 0
                    ref_sessions[(u, seq)] = [ts_us, ts_us, 0]
                ref_events[eid] = (u, ts_us, seq, pos)
                s = ref_sessions[(u, seq)]
                s[0] = min(s[0], ts_us)
                s[1] = max(s[1], ts_us)
                s[2] += 1
                pos += 1
                prev = ts_us
        return ref_events, ref_sessions

    def test_sessionize_and_rollup_match_reference(self, spark):
        rows = self._events()
        ref_events, ref_sessions = self._reference(rows)
        df = _df(spark, rows)
        got_e = {
            r.event_id: (r.user_id, r.ts_us, r.session_seq, r.event_seq)
            for r in sessions.sessionize(df, gap_s=self.GAP).collect()
        }
        assert got_e == ref_events
        got_s = sorted(
            (r.user_id, r.start_us, r.end_us, r.n_events)
            for r in sessions.session_rollup(df, gap_s=self.GAP).collect()
        )
        want_s = sorted(
            (u, lo, hi, n) for (u, _), (lo, hi, n) in ref_sessions.items()
        )
        assert got_s == want_s
