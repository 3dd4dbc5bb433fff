"""Plain-NumPy oracle of the reference VP state machine, for testing the
device implementation (semantics per SURVEY.md §2.3; written against the
reference's documented behavior at LK_Final.py:569-647).

Deliberately object-based and sequential — the point is to be obviously
faithful, not fast.
"""

import numpy as np


class OracleVP:
    def __init__(self, cfg, width, height):
        self.cfg = cfg
        self.w = width
        self.h = height
        self.reset_vp()
        self.history = []         # all_vp rows (x, y)
        self.csv_rows = []        # emitted rows in order

    def reset_vp(self):
        self.vp = None            # None = uninitialized
        self.vp_moved = False
        self.recent = []          # list of [x, y]; index of aliased entry or None
        self.alias_idx = None
        self.vp_ult = 0

    def _check_valid(self, cp):
        d = np.abs(np.asarray(self.vp, np.float64) - cp)
        return bool(
            (d < np.array([self.w * self.cfg.cp_thold,
                           self.h * self.cfg.cp_thold])).all()
        )

    def _recent_vals(self):
        out = []
        for k, v in enumerate(self.recent):
            if self.alias_idx is not None and k == self.alias_idx:
                out.append(np.asarray(self.vp, np.float64))
            else:
                out.append(np.asarray(v, np.float64))
        return out

    def process_frame(self, lines):
        """lines: list of dicts with start, stop, angle, length (accepted)."""
        cfg = self.cfg
        rows_this_frame = []
        import itertools

        for (l1, l2) in itertools.combinations(lines, 2):
            ad = abs(l1["angle"] - l2["angle"])
            if ad < cfg.min_ang_dif or ad > 360 - cfg.min_ang_dif:
                continue
            if cfg.cp_min_start_sep_frac > 0 and (
                abs(l1["start"][0] - l2["start"][0])
                < self.w * cfg.cp_min_start_sep_frac
            ):
                continue
            cp = self._cross(l2, l1)
            if cp is None or np.isnan(cp).any():
                continue
            x, y = cp
            if y > l1["start"][1] or y > l2["start"][1]:
                continue
            if self.vp is not None and not self._check_valid(cp):
                continue

            self.recent.append([x, y])
            if self.vp is not None:
                window = self._recent_vals()[-cfg.vp_ref_num:]
                # alias index relative bookkeeping
                difs = [v - np.asarray(self.vp, np.float64) for v in window]
                mean = np.mean(difs, axis=0)
                std = np.std(difs, axis=0)
                kept = [
                    d for d in difs
                    if (d <= mean + std * cfg.max_cp_std).all()
                    and (d >= mean - std * cfg.max_cp_std).all()
                ]
                if kept:
                    mv = np.mean(kept, axis=0)
                    self.vp = [
                        self.vp[0] + mv[0] * cfg.vp_update_rate,
                        self.vp[1] + mv[1] * cfg.vp_update_rate,
                    ]
                    self.vp_moved = True
                    self.vp_ult = 0
                    rows_this_frame.append(tuple(self.vp))
                    self.history.append(tuple(self.vp))
            elif len(self.recent) >= cfg.vp_ref_num:
                s = np.sum(np.asarray(self.recent, np.float64), axis=0)
                s = s / cfg.vp_ref_num
                self.vp = [s[0], s[1]]
                self.vp_ult = 0
                if cfg.vp_init_aliasing:
                    self.alias_idx = len(self.recent) - 1

        self.csv_rows.extend(rows_this_frame)

        # show / hide block
        hidden = False
        if self.vp is not None:
            if self.vp_ult > cfg.hide_vp_thold:
                self.reset_vp_keep_ult()
                hidden = True
            else:
                self.csv_rows.append(tuple(self.vp))
                self.history.append(tuple(self.vp))
        self.vp_ult += 1
        return rows_this_frame, hidden

    def reset_vp_keep_ult(self):
        ult = self.vp_ult
        self.reset_vp()
        self.vp_ult = ult

    @staticmethod
    def _cross(l1, l2):
        x1, y1 = l1["start"]
        x2, y2 = l1["stop"]
        x3, y3 = l2["start"]
        x4, y4 = l2["stop"]
        if x2 - x1 == 0:
            return np.array([np.nan, np.nan])  # deviation: reject vertical l1
        k1 = (y2 - y1) / (x2 - x1)
        b1 = y1 - x1 * k1
        if x4 - x3 == 0:
            x = x3
        else:
            k2 = (y4 - y3) / (x4 - x3)
            b2 = y3 - x3 * k2
            if k1 - k2 == 0:
                return None
            x = (b2 - b1) / (k1 - k2)
        y = k1 * x + b1
        return np.array([x, y], np.float64)


def oracle_line(start, stop):
    v = np.array([stop[0] - start[0], -(stop[1] - start[1])], np.float64)
    n = np.linalg.norm(v)
    ang = np.degrees(np.arccos(np.clip(v[0] / n, -1, 1))) if n > 0 else 0.0
    if v[1] < 0:
        ang = 360.0 - ang
    return dict(
        start=np.asarray(start, np.float64),
        stop=np.asarray(stop, np.float64),
        angle=ang,
        length=np.round(n, 2),
    )
