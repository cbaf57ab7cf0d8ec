"""Analytics + monitoring solutions: Analytics charts, DistanceCalculation,
SecurityAlarm, AIGym (reference solutions/{analytics,distance_calculation,
security_alarm,ai_gym}.py).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from fce_yolo_tpu.solutions.base import BaseSolution, SolutionResults

__all__ = ["Analytics", "DistanceCalculation", "SecurityAlarm", "AIGym"]


class Analytics(BaseSolution):
    """Per-frame class-count analytics rendered as a line/bar/pie chart
    (reference analytics.py: matplotlib figure streamed as frames)."""

    def __init__(self, analytics_type: str = "line", **kw):
        super().__init__(**kw)
        assert analytics_type in ("line", "bar", "pie", "area")
        self.analytics_type = analytics_type
        self.frames: list[int] = []
        self.history: dict[str, list[int]] = defaultdict(list)

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        counts: dict[str, int] = defaultdict(int)
        for row in tracks:
            counts[self.names.get(int(row[6]), str(int(row[6])))] += 1
        self.frames.append(len(self.frames))
        for name in set(self.history) | set(counts):
            self.history[name].append(counts.get(name, 0))
        return SolutionResults(plot_im=self._render(),
                               classwise_count=dict(counts),
                               total_tracks=len(tracks),
                               frame=self.frames[-1])

    def _render(self) -> np.ndarray:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.4, 4.8), dpi=100)
        if self.analytics_type in ("line", "area"):
            for name, ys in self.history.items():
                xs = range(len(ys))
                if self.analytics_type == "area":
                    ax.fill_between(list(xs), ys, alpha=0.4, label=name)
                else:
                    ax.plot(list(xs), ys, label=name, marker="o", ms=2)
            ax.set_xlabel("frame"); ax.set_ylabel("count"); ax.legend(fontsize=7)
        elif self.analytics_type == "bar":
            latest = {k: v[-1] for k, v in self.history.items()}
            ax.bar(list(latest.keys()), list(latest.values()))
        else:  # pie
            latest = {k: v[-1] for k, v in self.history.items() if v[-1] > 0}
            if latest:
                ax.pie(list(latest.values()), labels=list(latest.keys()))
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3][..., ::-1].copy()
        plt.close(fig)
        return buf


class DistanceCalculation(BaseSolution):
    """Pixel (and optionally calibrated) distance between two selected track
    ids (reference distance_calculation.py; selection is by id here instead
    of mouse clicks — there is no GUI in this environment)."""

    def __init__(self, selected_ids: tuple[int, int] | None = None,
                 pixels_per_meter: float | None = None, **kw):
        super().__init__(**kw)
        self.selected_ids = selected_ids
        self.pixels_per_meter = pixels_per_meter

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        ann = self.annotator(result.plot())
        distance = 0.0
        distance_m = None
        centers = {
            int(r[4]): ((r[0] + r[2]) / 2, (r[1] + r[3]) / 2) for r in tracks
        }
        ids = self.selected_ids or (sorted(centers)[:2] if len(centers) >= 2 else None)
        if ids and all(i in centers for i in ids):
            p1, p2 = np.asarray(centers[ids[0]]), np.asarray(centers[ids[1]])
            distance = float(np.linalg.norm(p1 - p2))
            if self.pixels_per_meter:
                distance_m = distance / self.pixels_per_meter
            ann.plot_distance_and_line(distance, (p1, p2))
        return SolutionResults(plot_im=ann.result(), pixels_distance=distance,
                               total_tracks=len(tracks),
                               distance_m=distance_m)


class SecurityAlarm(BaseSolution):
    """Raise an alarm when the detection count crosses a threshold
    (reference security_alarm.py; the email sink is replaced by a callback —
    no SMTP in this environment)."""

    def __init__(self, records: int = 5, on_alarm=None, **kw):
        super().__init__(**kw)
        self.records = records
        self.on_alarm = on_alarm
        self.alarm_sent = False

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        ann = self.annotator(result.plot())
        n = len(tracks)
        triggered = n >= self.records
        if triggered and not self.alarm_sent:
            self.alarm_sent = True
            if self.on_alarm is not None:
                self.on_alarm(n)
        if triggered:
            ann.display_analytics(ann.im, {"ALARM": n},
                                  txt_color=(255, 255, 255),
                                  bg_color=(0, 0, 255))
        return SolutionResults(plot_im=ann.result(), total_tracks=n,
                               email_sent=self.alarm_sent, alarm=triggered)


class AIGym(BaseSolution):
    """Workout repetition counting from pose keypoints (reference
    ai_gym.py:40-110: joint angle vs up/down thresholds drives a per-track
    stage machine). Needs a -pose model."""

    def __init__(self, kpts: tuple[int, int, int] = (6, 8, 10),
                 up_angle: float = 145.0, down_angle: float = 90.0, **kw):
        kw.setdefault("model", "yolo11n-pose.yaml")
        super().__init__(**kw)
        self.kpts = kpts
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.states: dict[int, dict] = defaultdict(lambda: {"angle": 0.0, "count": 0, "stage": "-"})

    def process(self, result, tracks: np.ndarray) -> SolutionResults:
        from fce_yolo_tpu.solutions.annotator import SolutionAnnotator

        ann = self.annotator(result.plot())
        if result.keypoints is not None:
            kdata = getattr(result.keypoints, "data", result.keypoints)
            for i, k in enumerate(np.asarray(kdata)):
                tid = int(tracks[i, 4]) if i < len(tracks) else i
                st = self.states[tid]
                st["angle"] = SolutionAnnotator.estimate_pose_angle(
                    *[k[j] for j in self.kpts])
                if st["angle"] < self.down_angle:
                    if st["stage"] == "up":
                        st["count"] += 1
                    st["stage"] = "down"
                elif st["angle"] > self.up_angle:
                    st["stage"] = "up"
                ann.draw_specific_kpts(k, list(self.kpts))
                ann.plot_angle_and_count_and_stage(
                    st["angle"], st["count"], st["stage"], k[self.kpts[1]][:2])
        return SolutionResults(
            plot_im=ann.result(), total_tracks=len(tracks),
            workout_count=[v["count"] for v in self.states.values()],
            workout_stage=[v["stage"] for v in self.states.values()],
            workout_angle=[v["angle"] for v in self.states.values()])
