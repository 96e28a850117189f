"""Date/time utilities: Gregorian <-> Julian day, leap years, calendar
decomposition, local sidereal time.

Parity: core/include/tsd/temps.hpp:21-385, core/src/temps.cc:66-597
(DateHeure / Duree / Calendrier / HeureComposite; astronomy-grade sidereal
time).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

__all__ = [
    "is_leap_year", "days_in_month", "gregorian_to_jd", "jd_to_gregorian",
    "mjd", "day_of_week", "sidereal_time", "local_sidereal_time",
    "Calendar", "TimeOfDay", "DateTime",
]


def is_leap_year(y: int) -> bool:
    """Parity: est_bissextile, temps.cc."""
    return (y % 4 == 0 and y % 100 != 0) or (y % 400 == 0)


def days_in_month(y: int, m: int) -> int:
    d = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1]
    if m == 2 and is_leap_year(y):
        return 29
    return d


def gregorian_to_jd(y: int, m: int, d: float) -> float:
    """Gregorian calendar -> Julian day (parity: temps.cc Gregorian->JD,
    standard Fliegel-Van Flandern form)."""
    if m <= 2:
        y -= 1
        m += 12
    a = y // 100
    b = 2 - a + a // 4
    return (np.floor(365.25 * (y + 4716)) + np.floor(30.6001 * (m + 1))
            + d + b - 1524.5)


def jd_to_gregorian(jd: float) -> Tuple[int, int, float]:
    """Julian day -> (year, month, day-with-fraction)."""
    z = np.floor(jd + 0.5)
    f = (jd + 0.5) - z
    if z < 2299161:
        a = z
    else:
        alpha = np.floor((z - 1867216.25) / 36524.25)
        a = z + 1 + alpha - np.floor(alpha / 4)
    b = a + 1524
    c = np.floor((b - 122.1) / 365.25)
    d0 = np.floor(365.25 * c)
    e = np.floor((b - d0) / 30.6001)
    day = b - d0 - np.floor(30.6001 * e) + f
    month = int(e - 1 if e < 14 else e - 13)
    year = int(c - 4716 if month > 2 else c - 4715)
    return year, month, float(day)


def mjd(y: int, m: int, d: float) -> float:
    """Modified Julian day."""
    return gregorian_to_jd(y, m, d) - 2400000.5


def day_of_week(y: int, m: int, d: int) -> int:
    """0 = Monday .. 6 = Sunday."""
    jd = gregorian_to_jd(y, m, d)
    return int((jd + 0.5) % 7)  # JD 0 was a Monday at noon


def sidereal_time(jd: float) -> float:
    """Greenwich mean sidereal time in radians (parity: temps_sidéral,
    temps.cc — Meeus formula)."""
    T = (jd - 2451545.0) / 36525.0
    theta = (280.46061837 + 360.98564736629 * (jd - 2451545.0)
             + 0.000387933 * T * T - T ** 3 / 38710000.0)
    return np.deg2rad(theta % 360.0)


def local_sidereal_time(jd: float, longitude_deg: float) -> float:
    """Local sidereal time in radians (parity: temps_sidéral_local)."""
    return (sidereal_time(jd) + np.deg2rad(longitude_deg)) % (2 * np.pi)


@dataclasses.dataclass(frozen=True)
class Calendar:
    """Parity: Calendrier, temps.hpp."""
    year: int
    month: int
    day: int

    def to_jd(self) -> float:
        return gregorian_to_jd(self.year, self.month, self.day)


@dataclasses.dataclass(frozen=True)
class TimeOfDay:
    """Parity: HeureComposite."""
    hour: int = 0
    minute: int = 0
    second: float = 0.0

    @property
    def day_fraction(self) -> float:
        return (self.hour + self.minute / 60 + self.second / 3600) / 24


@dataclasses.dataclass(frozen=True)
class DateTime:
    """Parity: DateHeure (microsecond-grade epoch arithmetic via JD)."""
    cal: Calendar
    tod: TimeOfDay = TimeOfDay()

    @property
    def jd(self) -> float:
        return self.cal.to_jd() + self.tod.day_fraction

    def sidereal(self, longitude_deg: float = 0.0) -> float:
        return local_sidereal_time(self.jd, longitude_deg)

    @classmethod
    def from_jd(cls, jd: float) -> "DateTime":
        y, m, d = jd_to_gregorian(jd)
        di = int(d)
        frac = d - di
        h = int(frac * 24)
        mi = int((frac * 24 - h) * 60)
        s = ((frac * 24 - h) * 60 - mi) * 60
        return cls(Calendar(y, m, di), TimeOfDay(h, mi, s))
