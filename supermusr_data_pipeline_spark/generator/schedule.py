"""G6: a minimal JSON schedule DSL driving the message builders.

The reference simulator executes a JSON script of actions — run control
sends, frame loops, digitiser loops, timestamp set/advance, veto/period
setters, trace/event generation
(simulator/src/integrated/simulation_engine/actions.rs:83-137).  SURVEY §2.9
scopes this as a fixture driver, not an engine feature: this interpreter
walks the script driver-side and emits ``(topic, payload bytes)`` pairs via
the G7 builders (sources/messages.py), ready to become an envelope
DataFrame or parquet stream feeding the engine under test.

Supported actions (dicts; nested ``body`` lists for loops):

    set_timestamp {iso}             advance_ms {ms}
    set_veto {flags}                set_period {n}
    set_protons_per_pulse {n}       run_start {name, ...}
    run_stop {name}                 run_log {source, value, value_type?}
    se_log {name, values, ...}      alarm {source, severity?, message?}
    frame_loop {frames, advance_ms?, body}
    digitiser_loop {ids, body}
    send_trace {n_samples?, n_pulses?, channels?, sample_rate?}
    send_event_list {max_events?}
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources import messages as M
from .simulator import CHANNELS_PER_DIGITIZER, _synth_channel

DEFAULT_TOPICS = {
    "trace": "daq-traces",
    "events": "daq-events",
    "control": "run-controls",
    "runlog": "runlog",
    "selog": "selog",
    "alarm": "alarms",
}


class ScheduleEngine:
    """Interprets a schedule script; collects (topic, payload) messages."""

    def __init__(self, seed: int = 42, topics: dict[str, str] | None = None):
        self.seed = seed
        self.topics = {**DEFAULT_TOPICS, **(topics or {})}
        self.ts_ns = 0
        self.frame = 0
        self.period = 0
        self.veto = 0
        self.ppp = 1
        self.digitizer = 0
        self.messages: list[tuple[str, bytes]] = []

    # -- helpers -----------------------------------------------------------

    def _metadata(self) -> dict:
        return {
            "ts_ns": self.ts_ns,
            "period_number": self.period,
            "protons_per_pulse": self.ppp,
            "running": True,
            "frame_number": self.frame,
            "veto_flags": self.veto,
        }

    def _emit(self, kind: str, payload: bytes) -> None:
        self.messages.append((self.topics[kind], payload))

    def _synth(self, a: dict) -> list[tuple[int, np.ndarray]]:
        n_samples = int(a.get("n_samples", 200))
        n_pulses = int(a.get("n_pulses", 3))
        channels = int(a.get("channels", CHANNELS_PER_DIGITIZER))
        out = []
        for ch in range(channels):
            v, _, _ = _synth_channel(
                np.array([self.seed, self.frame, self.digitizer, ch], dtype=np.uint64),
                n_samples,
                n_pulses,
                float(a.get("baseline", 50.0)),
                float(a.get("noise_sd", 4.0)),
                frame=self.frame,
            )
            out.append((ch + self.digitizer * channels, v.astype(np.uint16)))
        return out

    # -- interpreter -------------------------------------------------------

    def run(self, script: list[dict]) -> list[tuple[str, bytes]]:
        for a in script:
            self._step(a)
        return self.messages

    def _step(self, a: dict) -> None:
        act = a["action"]
        if act == "set_timestamp":
            self.ts_ns = int(pd.Timestamp(a["iso"]).value)
        elif act == "advance_ms":
            self.ts_ns += int(a["ms"]) * 1_000_000
        elif act == "set_veto":
            self.veto = int(a["flags"])
        elif act == "set_period":
            self.period = int(a["n"])
        elif act == "set_protons_per_pulse":
            self.ppp = int(a["n"])
        elif act == "run_start":
            self._emit(
                "control",
                M.encode_run_start(
                    start_time_ms=self.ts_ns // 1_000_000,
                    run_name=a["name"],
                    n_periods=int(a.get("n_periods", 1)),
                    filename=a.get("filename", f"{a['name']}.nxs"),
                    instrument_name=a.get("instrument_name", "SUPERMUSR"),
                ),
            )
        elif act == "run_stop":
            self._emit(
                "control",
                M.encode_run_stop(stop_time_ms=self.ts_ns // 1_000_000, run_name=a["name"]),
            )
        elif act == "run_log":
            self._emit(
                "runlog",
                M.encode_f144(
                    a["source"], self.ts_ns, a["value"], a.get("value_type", "double")
                ),
            )
        elif act == "se_log":
            self._emit(
                "selog",
                M.encode_se00(
                    a["name"],
                    self.ts_ns,
                    a["values"],
                    a.get("values_kind", "f64"),
                    channel=int(a.get("channel", -1)),
                    time_delta_ns=float(a.get("time_delta_ns", 0.0)),
                ),
            )
        elif act == "alarm":
            self._emit(
                "alarm",
                M.encode_al00(
                    a["source"], self.ts_ns, a.get("severity", "OK"), a.get("message")
                ),
            )
        elif act == "frame_loop":
            advance = int(a.get("advance_ms", 20))
            for _ in range(int(a["frames"])):
                for sub in a["body"]:
                    self._step(sub)
                self.frame += 1
                self.ts_ns += advance * 1_000_000
        elif act == "digitiser_loop":
            for did in a["ids"]:
                self.digitizer = int(did)
                for sub in a["body"]:
                    self._step(sub)
        elif act == "send_trace":
            chans = self._synth(a)
            self._emit(
                "trace",
                M.encode_dat2(
                    self.digitizer,
                    self._metadata(),
                    int(a.get("sample_rate", 1_000_000_000)),
                    chans,
                ),
            )
        elif act == "send_event_list":
            # derive a deterministic event list from the synthetic channels:
            # per-channel pulse maxima above baseline (fixture-grade events)
            chans = self._synth(a)
            max_events = int(a.get("max_events", 16))
            times, volts, ch_ids = [], [], []
            for ch_id, v in chans:
                idx = int(np.argmax(v))
                times.append(idx)
                volts.append(int(v[idx]))
                ch_ids.append(ch_id)
            self._emit(
                "events",
                M.encode_dev2(
                    self.digitizer,
                    self._metadata(),
                    times[:max_events],
                    volts[:max_events],
                    ch_ids[:max_events],
                ),
            )
        else:
            raise ValueError(f"unknown schedule action: {act!r}")


def run_schedule(script: list[dict], seed: int = 42) -> list[tuple[str, bytes]]:
    return ScheduleEngine(seed=seed).run(script)


def schedule_to_envelope(spark, script: list[dict], seed: int = 42):
    """Execute a schedule and return its messages as an envelope DataFrame
    (topic, value) — the in-test stand-in for the simulator's Kafka sends."""
    msgs = run_schedule(script, seed=seed)
    return spark.createDataFrame(msgs, "topic string, value binary")
