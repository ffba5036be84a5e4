"""tuned_defaults.json plumbing: utils/tuned loading + precedence,
bench.py's knob resolution, and pick_tuned's winner distillation.

The TPU tunnel drops for hours at a time, so knob sweeps run unattended
and their winners must reach the driver's FLAGLESS end-of-round bench
run through this file-based handoff (utils/tuned.py docstring) — these
tests pin the whole chain on synthetic records so a refactor cannot
silently break the one run that is scored.
"""

import json
import os
import sys
import types

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))

from pointcloud_render_tpu.utils import tuned  # noqa: E402


def _bench_args(**kw):
    ns = types.SimpleNamespace(
        tiles_per_program=None, dma_slots=None, chunk_rows=None,
        unroll=None, allow_exit=None, starts_method=None,
        no_uniform_look=False, trail_span=None, trail_segments=None,
        trail_cap10=None, trail_three_tone=None,
        droplet_segments=None, droplet_cap10=None,
        droplet_three_tone=None)
    ns.__dict__.update(kw)
    return ns


class TestLoadAndFill:
    def test_missing_file_is_empty(self, tmp_path):
        assert tuned.load_tuned(str(tmp_path / "nope.json")) == {}

    def test_garbage_file_is_empty(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text("{not json")
        assert tuned.load_tuned(str(p)) == {}
        p.write_text("[1, 2]")  # valid JSON, wrong shape
        assert tuned.load_tuned(str(p)) == {}

    def test_fill_precedence(self):
        sec = {"dma_slots": 4}
        assert tuned.fill(8, sec, "dma_slots", 2) == 8      # CLI wins
        assert tuned.fill(None, sec, "dma_slots", 2) == 4   # tuned next
        assert tuned.fill(None, {}, "dma_slots", 2) == 2    # builtin last


class TestBenchApplyTuned:
    def _with_tuned(self, monkeypatch, tmp_path, data):
        p = tmp_path / "tuned.json"
        p.write_text(json.dumps(data))
        monkeypatch.setattr(tuned, "TUNED_PATH", str(p))

    def test_fills_unset_knobs(self, monkeypatch, tmp_path):
        import bench

        self._with_tuned(monkeypatch, tmp_path, {
            "disc": {"tiles_per_program": 4, "dma_slots": 4,
                     "allow_exit": False, "uniform_look": False,
                     "unroll": 2},
            "trail": {"span": "4", "segments": 4,
                      "starts_method": "sort", "cap_rows10": True,
                      "three_tone": True}})
        ns = _bench_args()
        bench._apply_tuned(ns)
        assert ns.tiles_per_program == 4 and ns.dma_slots == 4
        assert ns.allow_exit == "off" and ns.unroll == 2
        assert ns.no_uniform_look is True
        assert ns.trail_span == "4" and ns.trail_segments == 4
        assert ns.trail_starts_method == "sort"
        assert ns.trail_cap10 == "on"
        assert ns.trail_three_tone == "on"

    def test_explicit_flags_win(self, monkeypatch, tmp_path):
        import bench

        self._with_tuned(monkeypatch, tmp_path, {
            "disc": {"tiles_per_program": 4},
            "trail": {"span": "4", "segments": 4}})
        ns = _bench_args(tiles_per_program=8, allow_exit="on",
                         trail_span="2")
        bench._apply_tuned(ns)
        assert ns.tiles_per_program == 8
        assert ns.allow_exit == "on" and ns.trail_span == "2"
        assert ns.trail_segments == 4  # unset flag still filled

    def test_absent_file_gives_builtins(self, monkeypatch, tmp_path):
        import bench

        monkeypatch.setattr(tuned, "TUNED_PATH",
                            str(tmp_path / "nope.json"))
        ns = _bench_args()
        bench._apply_tuned(ns)
        assert (ns.tiles_per_program, ns.dma_slots, ns.unroll) == (1, 2, 4)
        assert ns.allow_exit == "auto" and ns.starts_method == "scan"
        assert ns.trail_span == "auto" and ns.trail_segments is None
        assert ns.trail_starts_method == "scan"
        assert ns.trail_cap10 == "off"
        assert ns.trail_three_tone == "off"


def _raster_rec(ms, label="r", **kw):
    rec = dict(label=label, kind="raster", scene="disc", chunk_rows=256,
               allow_exit=False, unroll=4, dma_slots=2, span=2,
               max_big=256, tiles_per_program=1, starts_method="scan",
               ms=ms)
    rec.update(kw)
    return rec


def _shaded_rec(ms, uniform, unroll=4):
    return dict(label="s", kind="shaded", scene="disc",
                uniform_look=uniform, unroll=unroll, max_big=256, ms=ms)


class TestPickTuned:
    def test_picks_best_record_and_fused(self):
        import pick_tuned

        disc, note = pick_tuned.pick_disc([
            _raster_rec(16.0, label="builtin"),
            _raster_rec(12.5, label="tpp4", tiles_per_program=4,
                        dma_slots=4),
            _shaded_rec(30.0, False),
            _shaded_rec(24.0, True),
        ])
        assert disc["tiles_per_program"] == 4 and disc["dma_slots"] == 4
        assert disc["uniform_look"] is True

    def test_no_churn_when_builtin_within_noise(self):
        import pick_tuned

        disc, note = pick_tuned.pick_disc([
            _raster_rec(16.0, label="builtin"),
            _raster_rec(15.9, label="tpp4", tiles_per_program=4),
        ])
        assert disc is None and "builtin" in note

    def test_exit_on_wins_only_past_the_fused_savings(self):
        import pick_tuned

        # exit-on raster is 2 ms faster, but fused shading (exit-off
        # only) saves 6 ms -> exit-off + fused must win.
        disc, _ = pick_tuned.pick_disc([
            _raster_rec(16.0, label="builtin"),
            _raster_rec(15.0, label="off", dma_slots=4),
            _raster_rec(13.0, label="on", allow_exit=True, max_big=1024),
            _shaded_rec(30.0, False),
            _shaded_rec(24.0, True),
        ])
        assert disc["allow_exit"] is False and disc["uniform_look"]
        assert disc["dma_slots"] == 4
        # ...and with no fused savings, exit-on takes it.
        disc2, _ = pick_tuned.pick_disc([
            _raster_rec(16.0, label="builtin"),
            _raster_rec(15.0, label="off", dma_slots=4),
            _raster_rec(13.0, label="on", allow_exit=True, max_big=1024),
            _shaded_rec(24.0, False),
            _shaded_rec(24.5, True),
        ])
        assert disc2["allow_exit"] is True
        assert disc2["uniform_look"] is False

    def test_trail_from_log_sections(self):
        import pick_tuned

        log = (
            "=== bench verbose (HEADLINE) Tue Aug 18 13:00:00 UTC 2026"
            " ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.0}\n'
            "=== bench trail span4 A/B Tue Aug 18 14:30:00 UTC 2026 ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.4}\n')
        trail, _ = pick_tuned.pick_trail([], log)
        assert trail == {"span": "4", "segments": None}

    def test_trail_cap10_from_sweep_records(self):
        import pick_tuned

        recs = [_raster_rec(300.0, span=4, scene="trail"),
                _raster_rec(260.0, span=4, scene="trail",
                            cap_rows10=True)]
        trail, note = pick_tuned.pick_trail(recs, "")
        assert trail["cap_rows10"] is True
        # ...and within noise it stays off.
        recs2 = [_raster_rec(300.0, span=4, scene="trail"),
                 _raster_rec(299.0, span=4, scene="trail",
                             cap_rows10=True)]
        trail2, _ = pick_tuned.pick_trail(recs2, "")
        assert not (trail2 or {}).get("cap_rows10")

    def test_trail_three_tone_from_shaded_records(self):
        import pick_tuned

        def _sh(ms, three):
            return dict(label="s", kind="shaded", scene="trail", span=4,
                        three_tone=three, cap_rows10=False,
                        max_big=20480, ms=ms)

        trail, _ = pick_tuned.pick_trail([_sh(330.0, False),
                                          _sh(300.0, True)], "")
        assert trail["three_tone"] is True
        trail2, _ = pick_tuned.pick_trail([_sh(330.0, False),
                                           _sh(329.0, True)], "")
        assert not (trail2 or {}).get("three_tone")

    def test_trail_keeps_auto_within_noise(self):
        import pick_tuned

        log = (
            "=== bench verbose (HEADLINE) Tue Aug 18 13:00:00 UTC 2026"
            " ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.0}\n'
            "=== bench trail span2 A/B Tue Aug 18 14:00:00 UTC 2026 ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.02}\n')
        trail, note = pick_tuned.pick_trail([], log)
        assert trail is None and "auto" in note


class TestLastKnownGood:
    """The artifact-of-record contract: a run that dies on a wedged
    tunnel attaches the last REAL-chip success (clearly labelled) so the
    error record is not a context-free 0.0; CPU runs never persist."""

    def test_error_record_attaches_last_good(self, monkeypatch, tmp_path,
                                             capsys):
        import bench

        p = tmp_path / "last_bench.json"
        p.write_text(json.dumps({"ts": 1.0, "utc": "x",
                                 "record": {"metric": "m",
                                            "value": 38.3}}))
        monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(p))
        assert bench._last_good()["record"]["value"] == 38.3
        # _emit attaches it automatically on ANY error record.
        bench._emit("m", 0.0, vs=0.0, error="boom")
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["error"] == "boom"
        assert rec["last_known_good"]["record"]["value"] == 38.3

    def test_cpu_success_does_not_persist(self, monkeypatch, tmp_path,
                                          capsys):
        import bench

        p = tmp_path / "last_bench.json"
        monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(p))
        bench._emit("m", 5.0)
        capsys.readouterr()
        assert not p.exists()
        assert bench._last_good() is None


class TestPickTunedGuards:
    """The two review-caught decision hazards: a cap10-only win must not
    be credited to three_tone, and a negative end-to-end bench verdict
    must not be overridden by raster-only sweep evidence."""

    def test_three_tone_not_credited_for_cap10_win(self):
        import pick_tuned

        def _sh(ms, three, cap10):
            return dict(label="s", kind="shaded", scene="trail", span=4,
                        three_tone=three, cap_rows10=cap10,
                        max_big=20480, ms=ms)

        # three_tone alone shows no win; only the cap10 combo is fast.
        recs = [_sh(330.0, False, False), _sh(329.5, True, False),
                _sh(295.0, True, True)]
        trail, _ = pick_tuned.pick_trail(recs, "")
        assert not (trail or {}).get("three_tone")

    def test_negative_bench_verdict_blocks_sweep_fallback(self):
        import pick_tuned

        log = (
            "=== bench verbose (HEADLINE) Tue Aug 18 13:00:00 UTC 2026"
            " ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.0}\n'
            "=== bench trail cap10 A/B Tue Aug 18 14:00:00 UTC 2026"
            " ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.01}\n'
            "=== bench trail 3tone A/B Tue Aug 18 15:00:00 UTC 2026"
            " ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.02}\n')

        def _r(ms, cap10):
            return dict(label="r", kind="raster", scene="trail", span=4,
                        starts_method="scan", cap_rows10=cap10, ms=ms)

        def _sh(ms, three):
            return dict(label="s", kind="shaded", scene="trail", span=4,
                        three_tone=three, cap_rows10=False, ms=ms)

        # Raster-only sweep says cap10/three_tone win big, but the
        # end-to-end bench lines said "within noise" — keep auto.
        recs = [_r(260.0, False), _r(240.0, True),
                _sh(330.0, False), _sh(300.0, True)]
        trail, note = pick_tuned.pick_trail(recs, log)
        assert not (trail or {}).get("cap_rows10")
        assert not (trail or {}).get("three_tone")
        assert "keeping auto" in note


class TestPickTunedReviewGuards2:
    """Round-3 second review pass: decision hazards in the unattended
    distillation chain."""

    def test_negative_shade_delta_cannot_flip_exit_on(self):
        import pick_tuned

        # Fused shade LOSES by 2 ms; exit-on raster is slower than
        # exit-off — exit-on must NOT win via the negative delta.
        disc, _ = pick_tuned.pick_disc([
            _raster_rec(16.0, label="builtin"),
            _raster_rec(14.0, label="off", dma_slots=4),
            _raster_rec(15.5, label="on", allow_exit=True, max_big=1024),
            _shaded_rec(24.0, False),
            _shaded_rec(26.0, True),
        ])
        assert disc["allow_exit"] is False
        assert disc["uniform_look"] is False

    def test_corrupt_jsonl_line_loses_only_that_line(self, tmp_path):
        import pick_tuned

        p = tmp_path / "sweep.jsonl"
        p.write_text(json.dumps(_raster_rec(16.0)) + "\n"
                     + json.dumps(_raster_rec(15.0)) + "\n"
                     + '{"label": "trunca')  # killed mid-append
        recs = pick_tuned._read_jsonl(str(p))
        assert len(recs) == 2

    def test_shade_verdict_survives_raster_noise(self):
        import pick_tuned

        # Raster within noise of builtin, but the generic shade clearly
        # beats fused: uniform_look=False must still be distilled.
        disc, note = pick_tuned.pick_disc([
            _raster_rec(16.0, label="builtin"),
            _raster_rec(15.95, label="tpp4", tiles_per_program=4),
            _shaded_rec(24.0, False),
            _shaded_rec(26.0, True),
        ])
        assert disc == {"uniform_look": False}

    def test_span4_pool_filters_mixed_max_big(self):
        import pick_tuned

        # The mb=384 resident line is inherently faster; starts=sort at
        # the REAL mb=20480 beats scan at mb=20480 but not the mb=384
        # line — it must still be picked (same-mb comparison).
        def _r(ms, sm, mb):
            return dict(label="r", kind="raster", scene="trail", span=4,
                        starts_method=sm, cap_rows10=False, max_big=mb,
                        ms=ms)

        recs = [_r(200.0, "scan", 384), _r(260.0, "scan", 20480),
                _r(240.0, "sort", 20480), _r(239.0, "sort", 20480)]
        trail, _ = pick_tuned.pick_trail(recs, "")
        assert trail["starts_method"] == "sort"


class TestGeometryKnobCertification:
    """pick_tuned may only select GEOMETRY-changing knobs (trail
    segments) against a fidelity certificate (VERDICT r3 item 3)."""

    def _cert(self, tmp_path, monkeypatch, rates, bound=5e-3):
        import pick_tuned

        p = tmp_path / "fidelity_trail_segments.json"
        p.write_text(json.dumps({"bound": bound, "scene": {},
                                 "rates": rates}))
        monkeypatch.setattr(pick_tuned, "FIDELITY_CERT", str(p))

    def test_refused_without_certificate(self, tmp_path, monkeypatch):
        import pick_tuned

        monkeypatch.setattr(pick_tuned, "FIDELITY_CERT",
                            str(tmp_path / "absent.json"))
        trail = {"span": "auto", "segments": 4}
        note = pick_tuned.certify_geometry(trail)
        assert "segments" not in trail and "REFUSED" in note

    def test_refused_over_bound(self, tmp_path, monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"4": {"trail_rate": 0.02, "frame_rate": 1e-3}})
        trail = {"segments": 4}
        note = pick_tuned.certify_geometry(trail)
        assert "segments" not in trail and "REFUSED" in note

    def test_certified_pick_records_rate(self, tmp_path, monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"4": {"trail_rate": 2.5e-3, "frame_rate": 3e-4}})
        trail = {"segments": 4}
        note = pick_tuned.certify_geometry(trail)
        assert trail["segments"] == 4
        assert trail["segments_flip_rate"] == 2.5e-3
        assert "certified" in note

    def test_unmeasured_segment_count_refused(self, tmp_path, monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"8": {"trail_rate": 1e-4, "frame_rate": 1e-5}})
        trail = {"segments": 2}  # no "2" entry in the certificate
        note = pick_tuned.certify_geometry(trail)
        assert "segments" not in trail and "REFUSED" in note

    def test_none_segments_is_not_a_pick(self):
        import pick_tuned

        trail = {"span": "auto", "segments": None}
        assert pick_tuned.certify_geometry(trail) == ""
        assert "segments" not in trail

    def test_rows8_requires_combined_record(self, tmp_path, monkeypatch):
        """rows8 is fidelity-bearing: it certifies only against the
        '<segments>+rows8' COMBINED record; absent -> refused while an
        independently-certified segments pick survives."""
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"4": {"trail_rate": 2.5e-3, "frame_rate": 3e-4}})
        trail = {"segments": 4, "rows8": True}
        note = pick_tuned.certify_geometry(trail)
        assert trail["segments"] == 4
        assert "rows8" not in trail and "rows8_flip_rate" not in trail
        assert "REFUSED rows8" in note and "certified" in note

    def test_rows8_certified_records_rate(self, tmp_path, monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"4": {"trail_rate": 2.5e-3},
                    "4+rows8": {"trail_rate": 2.5e-3}})
        trail = {"segments": 4, "rows8": True}
        note = pick_tuned.certify_geometry(trail)
        assert trail["rows8"] is True
        assert trail["rows8_flip_rate"] == 2.5e-3
        assert "rows8 certified" in note

    def test_rows8_over_bound_refused(self, tmp_path, monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"4": {"trail_rate": 2.5e-3},
                    "4+rows8": {"trail_rate": 0.02}})
        trail = {"segments": 4, "rows8": True}
        note = pick_tuned.certify_geometry(trail)
        assert "rows8" not in trail and "REFUSED rows8" in note

    def test_rows8_at_default_segments(self, tmp_path, monkeypatch):
        """rows8 without a segments pick certifies against the
        default-count combined record ('8+rows8')."""
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"8": {"trail_rate": 2.3e-3},
                    "8+rows8": {"trail_rate": 2.3e-3}})
        trail = {"rows8": True}
        note = pick_tuned.certify_geometry(trail)
        assert trail["rows8"] is True and "rows8 certified" in note

    def test_default_anchored_acceptance(self, tmp_path, monkeypatch):
        """A scene whose BASELINE (segments=8) rate already exceeds the
        absolute bound still certifies knobs with negligible marginal
        cost — and refuses ones that add more than the margin."""
        import pick_tuned

        self._cert(tmp_path, monkeypatch,
                   {"8": {"trail_rate": 9e-3},
                    "1": {"trail_rate": 9.5e-3},
                    "2": {"trail_rate": 1.5e-2}})
        ok = {"segments": 1}
        note = pick_tuned.certify_geometry(ok)
        assert ok["segments"] == 1 and "certified" in note
        bad = {"segments": 2}
        note = pick_tuned.certify_geometry(bad)
        assert "segments" not in bad and "REFUSED" in note


class TestPartialLogCarryForward:
    """A queue that dies mid-run leaves a partial log; distill() must
    carry forward tuned sections with no new evidence instead of
    silently dropping measured winners (the round-4 queue-E abort was
    one pick_tuned invocation away from regressing the droplet lane
    back to builtin segments=8)."""

    def _cert(self, tmp_path, monkeypatch, both=True):
        import pick_tuned

        rates = {"4": {"trail_rate": 2.5e-3, "frame_rate": 3e-4},
                 "8": {"trail_rate": 2.3e-3, "frame_rate": 3e-4}}
        cert = {"bound": 5e-3,
                "scenes": {"traj_ball": {"rates": rates},
                           "traj_vel": {"rates": rates}}}
        p = tmp_path / "cert.json"
        p.write_text(json.dumps(cert))
        monkeypatch.setattr(pick_tuned, "FIDELITY_CERT", str(p))

    OLD = {"note": "prior",
           "disc": {"tiles_per_program": 4, "uniform_look": True},
           "trail": {"span": "auto", "segments": 4, "cap_rows10": True,
                     "three_tone": True},
           "droplet": {"segments": 4, "cap_rows10": True,
                       "three_tone": True}}

    TRAIL_ONLY_LOG = (
        "=== bench trail seg4 cap10 3tone A/B Thu Aug 20 08:00:00 UTC"
        " 2026 ===\n"
        '{"metric": "m", "trail_fps_1000k_points": 3.65}\n')

    def test_partial_log_carries_unmeasured_sections(self, tmp_path,
                                                     monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch)
        tuned, action, _ = pick_tuned.distill([], [], self.TRAIL_ONLY_LOG,
                                              old=self.OLD)
        assert action == "write"
        # Trail re-picked from the one measured line; disc and droplet
        # carried from the existing file, winners intact.
        assert tuned["trail"]["segments"] == 4
        assert tuned["droplet"] == self.OLD["droplet"] | {
            "segments_flip_rate": 2.5e-3}
        assert tuned["disc"] == self.OLD["disc"]

    def test_no_evidence_at_all_keeps_file(self, tmp_path, monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch)
        tuned, action, _ = pick_tuned.distill([], [], "", old={})
        assert tuned is None and action == "keep"

    def test_carried_section_still_recertifies(self, tmp_path,
                                               monkeypatch):
        import pick_tuned

        # Tightened certificate refuses segments=4: the carried droplet
        # section loses the geometry knob but keeps its perf knobs.
        p = tmp_path / "cert.json"
        p.write_text(json.dumps({
            "bound": 1e-6,
            "scenes": {"traj_ball": {"rates": {}},
                       "traj_vel": {"rates": {
                           "4": {"trail_rate": 2.5e-3}}}}}))
        monkeypatch.setattr(pick_tuned, "FIDELITY_CERT", str(p))
        old = {"droplet": dict(self.OLD["droplet"])}
        tuned, action, notes = pick_tuned.distill([], [], "", old=old)
        assert action == "write"
        assert "segments" not in tuned["droplet"]
        assert tuned["droplet"]["cap_rows10"] is True

    def test_sweep_records_alone_do_not_block_trail_carry(self, tmp_path,
                                                          monkeypatch):
        """Advisor r4 (medium): sweep6_trail.jsonl is git-tracked and
        persistent, so trail sweep records must NOT count as evidence
        against the measured bench winner — with no trail bench lines in
        the log, the bench-derived knobs carry forward and fresh
        sweep-derived picks merge on top without overriding them."""
        import pick_tuned

        self._cert(tmp_path, monkeypatch)
        recs = [  # a fresh seg-sweep with a starts=sort win, no bench
            dict(label="r", kind="raster", scene="trail", span=4,
                 starts_method="scan", cap_rows10=False, max_big=20480,
                 ms=260.0),
            dict(label="r", kind="raster", scene="trail", span=4,
                 starts_method="sort", cap_rows10=False, max_big=20480,
                 ms=240.0)]
        tuned, action, notes = pick_tuned.distill([], recs, "",
                                                  old=self.OLD)
        assert action == "write"
        # Measured bench winners intact...
        assert tuned["trail"]["segments"] == 4
        assert tuned["trail"]["cap_rows10"] is True
        assert tuned["trail"]["three_tone"] is True
        # ...with the new sweep-derived knob merged on top.
        assert tuned["trail"]["starts_method"] == "sort"

    def test_refuted_section_dropped_even_with_partial_evidence(
            self, tmp_path, monkeypatch):
        """Advisor r4 (low): a trail-refuting log with no disc/droplet
        evidence must DROP the refuted trail section, not keep the whole
        old file; with nothing else to carry the file is removed."""
        import pick_tuned

        self._cert(tmp_path, monkeypatch)
        log = (
            "=== bench verbose (HEADLINE) Thu Aug 20 08:00:00 UTC 2026"
            " ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.0}\n'
            "=== bench trail seg4 cap10 3tone A/B Thu Aug 20 08:10:00"
            " UTC 2026 ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.01}\n')
        old = {"trail": dict(self.OLD["trail"])}
        tuned, action, _ = pick_tuned.distill([], [], log, old=old)
        assert tuned is None and action == "remove"
        # ...and when another scene still carries, the refuted section
        # is dropped while the carried one survives.
        tuned2, action2, _ = pick_tuned.distill([], [], log,
                                                old=dict(self.OLD))
        assert action2 == "write"
        assert "trail" not in tuned2
        assert tuned2["disc"] == self.OLD["disc"]
        assert tuned2["droplet"]["segments"] == 4

    def test_refused_geometry_knob_drops_stale_flip_rate(self, tmp_path,
                                                         monkeypatch):
        """Advisor r4 (low): a carried section whose segments pick is
        REFUSED must not keep the old segments_flip_rate dangling."""
        import pick_tuned

        monkeypatch.setattr(pick_tuned, "FIDELITY_CERT",
                            str(tmp_path / "absent.json"))
        trail = {"segments": 4, "cap_rows10": True,
                 "segments_flip_rate": 2.5e-3}
        note = pick_tuned.certify_geometry(trail)
        assert "REFUSED" in note
        assert trail == {"cap_rows10": True}
        none_pick = {"segments": None, "segments_flip_rate": 2.5e-3}
        assert pick_tuned.certify_geometry(none_pick) == ""
        assert none_pick == {}

    def test_full_negative_sweep_removes(self, tmp_path, monkeypatch):
        import pick_tuned

        self._cert(tmp_path, monkeypatch)
        log = (
            "=== bench verbose (HEADLINE) Thu Aug 20 08:00:00 UTC 2026"
            " ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.0,'
            ' "droplet_fps_1000k_points": 2.0}\n'
            "=== bench trail seg4 cap10 3tone A/B Thu Aug 20 08:10:00"
            " UTC 2026 ===\n"
            '{"metric": "m", "trail_fps_1000k_points": 3.01}\n'
            "=== bench droplet seg8 base A/B Thu Aug 20 08:20:00 UTC"
            " 2026 ===\n"
            '{"metric": "m", "droplet_fps_1000k_points": 2.0}\n'
            "=== bench droplet seg4 cap10 3tone A/B Thu Aug 20 08:30:00"
            " UTC 2026 ===\n"
            '{"metric": "m", "droplet_fps_1000k_points": 2.01}\n')
        recs = [_raster_rec(16.0, label="builtin"),
                _raster_rec(15.95, label="tpp4", tiles_per_program=4),
                _shaded_rec(24.0, True), _shaded_rec(24.05, False)]
        tuned, action, _ = pick_tuned.distill(recs, [], log, old=self.OLD)
        assert tuned is None and action == "remove"


class TestTrailSegmentsFidelity:
    def test_tuned_flip_rate_matches_committed_certificate(self):
        """VERDICT r4 weak #3: the flip rate recorded in
        tuned_defaults.json must BE the committed certificate's rate for
        that exact (preset, segments) — the artifact that gated
        production lives in the repo, or the pick is invalid.  Round 4
        shipped three mutually inconsistent flip-rate sets because the
        gating certificate was regenerated on the TPU queue and never
        committed; this test fails on any such divergence."""
        root = os.path.join(os.path.dirname(__file__), "..")
        tuned_path = os.path.join(root, "tuned_defaults.json")
        if not os.path.exists(tuned_path):
            pytest.skip("no tuned_defaults.json in the tree")
        with open(tuned_path) as f:
            tuned_file = json.load(f)
        cert_path = os.path.join(root, "benchmarks", "results",
                                 "fidelity_trail_segments.json")
        with open(cert_path) as f:
            cert = json.load(f)
        for scene, preset in (("trail", "traj_ball"),
                              ("droplet", "traj_vel")):
            sec = tuned_file.get(scene) or {}
            if sec.get("segments") is None:
                # No geometry pick -> no dangling rate allowed either
                # (advisor r4 low).
                assert "segments_flip_rate" not in sec, (scene, sec)
                continue
            rates = (cert.get("scenes")
                     or {"traj_ball": cert})[preset]["rates"]
            rec = rates[str(sec["segments"])]
            assert sec.get("segments_flip_rate") == rec["trail_rate"], (
                f"{scene}: tuned_defaults.json records flip rate "
                f"{sec.get('segments_flip_rate')} for segments="
                f"{sec['segments']} but the committed certificate says "
                f"{rec['trail_rate']} — regenerate the certificate at "
                f"the gating scale (benchmarks/fidelity_trail.py) or "
                f"re-run pick_tuned against it")

    def test_flip_rate_within_recorded_bound(self):
        """Recompute the winner-flip rate of the production-candidate
        segment counts at CI scale and pin it against the committed
        certificate's bound — a geometry regression (or a bound edit
        that outruns the measurement) fails here."""
        import jax

        if jax.default_backend() != "cpu":
            pytest.skip("exactness measurement runs on CPU")
        from pointcloud_render_tpu.utils.fidelity import (
            trail_segments_flip_rate,
        )

        cert_path = os.path.join(os.path.dirname(__file__), "..",
                                 "benchmarks", "results",
                                 "fidelity_trail_segments.json")
        with open(cert_path) as f:
            cert = json.load(f)
        r = trail_segments_flip_rate(4, n_points=1500, frames=(120,))
        assert r["trail_rate"] <= cert["bound"]
        assert r["kind_rate"] <= r["trail_rate"]
        # The committed certificate itself must be within the tuner's
        # limit for every scene it certifies: the absolute bound, or
        # the default-8 anchored margin where the baseline exceeds it
        # (pick_tuned.certify_geometry).
        import pick_tuned

        for preset, scene in cert.get("scenes",
                                      {"traj_ball": cert}).items():
            rates = scene["rates"]
            anchor = (rates.get("8") or {}).get("trail_rate")
            limit = cert["bound"] if anchor is None else max(
                cert["bound"], anchor + pick_tuned.GEOMETRY_REL_MARGIN)
            for segs, rec in rates.items():
                assert rec["trail_rate"] <= limit, (preset, segs)
