"""Real-world gov.uk data adapter (data/realworld.py): parser on the
reference's padded-column CSV format, incidence algebra, wave metrics."""

import numpy as np

from epidemicsimulator_tpu.data.realworld import (
    daily_cases,
    largest_wave,
    load_gov_uk_csv,
    sim_daily_incidence,
    sim_vaccination_metrics,
    vaccination_rollout_metrics,
    wave_metrics,
)

CSV = """areaType,areaName,areaCode ,date      ,newCasesBySpecimenDate,cumCasesBySpecimenDate
ltla    ,York    ,E06000014,2022-01-03,7                     ,30
ltla    ,York    ,E06000014,2022-01-02,20                    ,23
ltla    ,York    ,E06000014,2022-01-01,3                     ,3
"""


def _write(tmp_path, text):
    p = tmp_path / "cases.csv"
    p.write_text(text)
    return str(p)


def test_parser_strips_and_sorts(tmp_path):
    d = load_gov_uk_csv(_write(tmp_path, CSV))
    assert d["areaCode"][0] == "E06000014"
    dates, cases = daily_cases(_write(tmp_path, CSV))
    assert [x.isoformat() for x in dates] == [
        "2022-01-01", "2022-01-02", "2022-01-03"
    ]
    np.testing.assert_array_equal(cases, [3, 20, 7])


def test_parser_on_reference_files():
    # the committed real files parse and are internally consistent
    # (cumulative == running sum of news, reverse-chronological source)
    import os

    path = "/root/reference/reference_data/York/cases.csv"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference data not present")
    dates, cases = daily_cases(path)
    d = load_gov_uk_csv(path)
    cum = d["cumCasesBySpecimenDate"]
    assert len(dates) == 818
    assert (np.diff(cum) == cases[1:]).all()
    assert cum[-1] == 64_625


def test_sim_daily_incidence_exact():
    # 48 hours; seeded 5 infected at t=0; 2 new onsets at hour 1; one
    # I->R at hour 25 (dI+dR still 0 new onsets that hour)
    T = 48
    seirv = np.zeros((T, 5), np.int64)
    S, E, I, R = 100, 0, 5, 0
    rows = []
    for t in range(T):
        if t == 1:
            I += 2
            S -= 2
        if t == 25:
            I -= 1
            R += 1
        rows.append([S, E, I, R, 0])
    seirv = np.asarray(rows)
    daily = sim_daily_incidence(seirv)
    assert daily.tolist() == [7, 0]  # 5 seeds + 2 onsets day 1; none day 2


def test_largest_wave_and_metrics():
    n = 400
    daily = np.zeros(n)
    x = np.arange(80)
    daily[200:280] = 1000 * np.exp(-0.5 * ((x - 40) / 10.0) ** 2)
    dates = np.arange(n)
    w = largest_wave(dates, daily, window_days=120)
    assert w.start <= 200 and w.stop >= 270
    m = wave_metrics(daily[w], population=200_000)
    assert m["peak_daily_per_100k"] == 500.0
    assert 20 <= m["fwhm_days"] <= 28


def test_vaccination_metrics():
    pop = 1000
    cum = np.concatenate([np.zeros(10), np.arange(0, 900, 30)])
    m = vaccination_rollout_metrics(np.arange(len(cum)), cum, pop)
    assert m["days_to_50pct"] == 10 + 17  # 17*30=510 >= 500
    assert m["final_uptake_pct"] == 87.0

    seirv = np.zeros((100 * 24, 5), np.int64)
    seirv[:, 4] = np.minimum(np.arange(2400) * 2, 900)
    sm = sim_vaccination_metrics(seirv, pop)
    assert sm["days_to_50pct"] == 250 // 24
    assert sm["final_uptake_pct"] == 90.0


def test_target_from_daily_cases():
    from epidemicsimulator_tpu.data.realworld import target_from_daily_cases

    daily = np.array([24.0, 48.0, 0.0])
    t = target_from_daily_cases(daily, population=1000, infected_time=24)
    assert t.shape == (72, 5)
    # end of day 1: all 24 of day-1's onsets still infected
    assert np.isclose(t[23, 2], 24.0)
    # end of day 2: day-1's have rolled out, day-2's 48 in
    assert np.isclose(t[47, 2], 48.0)
    assert np.isclose(t[47, 3], 24.0)
    # census balances
    assert np.allclose(t[:, [0, 2, 3]].sum(axis=1), 1000.0)
    # ascertainment scales
    t2 = target_from_daily_cases(daily, 1000, infected_time=24,
                                 ascertainment=0.5)
    assert np.isclose(t2[23, 2], 48.0)
