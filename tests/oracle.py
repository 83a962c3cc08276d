"""Scalar oracle: a literal, slow Python transcription of ESUCD's step.

Independent of the JAX engine — plain dicts, lists and per-citizen loops that
follow sim/src/simulator.rs:131-556 + citizen.rs + disease.rs semantics
clause by clause (including the bugs-as-behaviour: inverted mask plumbing,
`as u8` truncation, the never-pruned building-exposure vaccine pool).  Tests
compare the two implementations distributionally.
"""

from __future__ import annotations

import numpy as np

S, E, I, R, V = 0, 1, 2, 3, 4
MASK_NONE, MASK_PT, MASK_EVERYWHERE = 0, 1, 2


class Oracle:
    def __init__(self, world, params, seed=0, bus_capacity=20):
        self.w = world
        self.p = params.disease
        self.th = params.thresholds
        self.rng = np.random.default_rng(seed)
        self.bus_capacity = bus_capacity
        n = world.n_citizens
        self.status = np.zeros(n, np.int64)
        self.timer = np.zeros(n, np.int64)
        self.at_work = np.zeros(n, np.bool_)
        self.on_bus = np.zeros(n, np.bool_)
        self.bus_to_work = np.zeros(n, np.bool_)
        self.lockdown = False
        self.vaccination_started = False
        self.mask_status = MASK_NONE
        self.eligible: set[int] = set()
        self.hour = 0
        self.history = []

    # -- pieces ----------------------------------------------------------
    def exposure_chance(self, c):
        """disease.rs:131-154 via citizen.rs:228-240's argument plumbing."""
        w, p = self.w, self.p
        # citizen.rs:228-232: compliant citizens pass MaskStatus::None
        mask_status = MASK_NONE if w.mask_compliant[c] else self.mask_status
        flag = w.mask_compliant[c] and self.on_bus[c]
        chance = p.exposure_chance
        if mask_status == MASK_PT:
            if flag:
                chance -= p.exposure_chance * p.mask_effectiveness
        elif mask_status == MASK_EVERYWHERE:
            chance -= p.exposure_chance * p.mask_effectiveness
        if self.status[c] == V:
            chance -= 1.0
        return max(chance, 0.0)

    def expose(self, c, n_exposures):
        """citizen.rs:221-248 (binomial with `n as u8`)."""
        n8 = n_exposures % 256
        q = 1.0 - (1.0 - self.exposure_chance(c)) ** n8
        if self.status[c] == S and self.rng.random() < q:
            self.status[c] = E
            self.timer[c] = 0
            return True
        return False

    # -- one step ----------------------------------------------------------
    def step(self):
        w, p = self.w, self.p
        n = w.n_citizens
        self.hour += 1
        h24 = self.hour % 24

        # generate_exposures: timer advance + movement + manifests
        building_infected: dict[int, list[int]] = {}
        routes: dict[tuple, list[tuple[int, bool]]] = {}
        for c in range(n):
            st, t = self.status[c], self.timer[c]
            if st == E:
                if p.exposed_time <= t:
                    self.status[c], self.timer[c] = I, 0
                else:
                    self.timer[c] = t + 1
            elif st == I:
                if p.infected_time <= t:
                    self.status[c] = R
                    self.timer[c] = 0
                else:
                    self.timer[c] = t + 1

            if not self.lockdown:
                if h24 == w.work_start[c] - 1 and w.uses_transport[c]:
                    self.on_bus[c] = True
                    self.bus_to_work[c] = True
                elif h24 == w.work_start[c]:
                    self.at_work[c] = True
                    self.on_bus[c] = False
                elif h24 == w.work_end[c] - 1 and w.uses_transport[c]:
                    self.on_bus[c] = True
                    self.bus_to_work[c] = False
                elif h24 == w.work_end[c]:
                    self.at_work[c] = False
                    self.on_bus[c] = False
                else:
                    self.on_bus[c] = False

            if self.on_bus[c]:
                src = w.home_oa[c] if self.bus_to_work[c] else w.work_oa[c]
                dst = w.work_oa[c] if self.bus_to_work[c] else w.home_oa[c]
                routes.setdefault((src, dst), []).append(
                    (c, self.status[c] == I)
                )
            elif self.status[c] == I:
                b = w.work_building[c] if self.at_work[c] else w.home_building[c]
                building_infected.setdefault(int(b), []).append(c)

        seirv = np.bincount(self.status, minlength=5).astype(np.int64)

        # apply_exposures: buildings
        exposures_this_step = 0
        hb = np.asarray(w.home_building)
        wb = np.asarray(w.work_building)
        for b, infected in building_infected.items():
            n_inf = len(infected)
            # find_exposures: household/workplace -> registered occupants
            # once; school -> each infected's room participants.
            if self._is_school_building(b):
                candidates = []
                for ic in infected:
                    rm = w.room[ic]
                    candidates.extend(self._room_members(rm))
            else:
                candidates = self._building_occupants(b, hb, wb)
            b_oa = self._building_oa(b)
            for c in candidates:
                cur_oa = w.work_oa[c] if self.at_work[c] else w.home_oa[c]
                if cur_oa != b_oa:
                    continue  # simulator.rs:323-325
                if self.status[c] == S and self.expose(c, n_inf):
                    exposures_this_step += 1
                    # building path prunes only the (never-initialised)
                    # area-level list -> no pruning of self.eligible

        # apply_exposures: buses
        for route, riders in routes.items():
            riders = list(riders)
            self.rng.shuffle(riders)
            # pop from the end into capacity-20 buses
            buses, cur = [], []
            while riders:
                if len(cur) >= self.bus_capacity:
                    buses.append(cur)
                    cur = []
                cur.append(riders.pop())
            if cur:
                buses.append(cur)
            for bus in buses:
                n_inf = sum(1 for _, inf in bus if inf)
                if n_inf == 0:
                    continue
                for c, _ in bus:
                    if self.status[c] == S and self.expose(c, n_inf):
                        exposures_this_step += 1
                        self.eligible.discard(c)  # simulator.rs:447-449

        seirv[S] -= exposures_this_step
        seirv[E] += exposures_this_step

        # apply_interventions
        pct = seirv[I] / seirv.sum()
        self.lockdown = self.th.lockdown >= 0 and self.th.lockdown < pct
        if (
            not self.vaccination_started
            and self.th.vaccination >= 0
            and self.th.vaccination < pct
        ):
            self.vaccination_started = True
            self.eligible = {c for c in range(n) if self.status[c] == S}

        ms = self.mask_status
        if ms == MASK_NONE:
            if pct > self.th.mask_public_transport:
                ms = MASK_PT
        elif ms == MASK_PT:
            if pct < self.th.mask_public_transport:
                ms = MASK_NONE
            elif pct > self.th.mask_everywhere:
                ms = MASK_EVERYWHERE
        else:
            if pct < self.th.mask_everywhere:
                ms = MASK_PT
        self.mask_status = ms

        if self.vaccination_started and self.eligible:
            k = min(int(self.p.vaccination_rate), len(self.eligible))
            chosen = self.rng.choice(sorted(self.eligible), size=k, replace=False)
            for c in chosen:
                self.status[c] = V  # unconditional, simulator.rs:551
                # NOT removed from eligible (reference keeps them)

        self.history.append(seirv.copy())
        return seirv[S] + seirv[E] + seirv[I] > 0

    # -- building helpers --------------------------------------------------
    def _is_school_building(self, b):
        w = self.w
        if not hasattr(self, "_school_buildings"):
            self._school_buildings = set(
                int(x)
                for x in np.asarray(w.work_building)[np.asarray(w.is_school_work)]
            )
        return b in self._school_buildings

    def _room_members(self, rm):
        w = self.w
        if not hasattr(self, "_room_map"):
            self._room_map = {}
            rooms = np.asarray(w.room)
            for c in range(w.n_citizens):
                if rooms[c] < w.n_rooms:
                    self._room_map.setdefault(int(rooms[c]), []).append(c)
        return self._room_map.get(int(rm), [])

    def _building_occupants(self, b, hb, wb):
        if not hasattr(self, "_occ_map"):
            self._occ_map = {}
            for c in range(self.w.n_citizens):
                self._occ_map.setdefault(int(hb[c]), []).append(c)
                if int(wb[c]) != int(hb[c]):
                    self._occ_map.setdefault(int(wb[c]), []).append(c)
        return self._occ_map.get(int(b), [])

    def _building_oa(self, b):
        w = self.w
        if not hasattr(self, "_b_oa"):
            self._b_oa = {}
            hb, wb = np.asarray(w.home_building), np.asarray(w.work_building)
            ho, wo = np.asarray(w.home_oa), np.asarray(w.work_oa)
            for c in range(w.n_citizens):
                self._b_oa[int(hb[c])] = int(ho[c])
                self._b_oa[int(wb[c])] = int(wo[c])
        return self._b_oa[int(b)]

    def run(self, max_steps):
        for _ in range(max_steps):
            if not self.step():
                break
        return np.array(self.history)
