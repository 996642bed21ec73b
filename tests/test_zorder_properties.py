"""Hypothesis properties for the Morton-cell and zone-map enumeration
(pure Python — no Spark session): the superset invariant that pruning
correctness rests on, over randomized layouts and query boxes, not
just the registry constants."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from psd_project_spark.operators.zorder import (
    _BINS,
    _EPOCH,
    _SPREAD,
    _bin_width,
    zcells_for_box,
)

_DAY = st.integers(min_value=0, max_value=5000)
_CUST = st.integers(min_value=0, max_value=200_000)


@st.composite
def _layout_and_box(draw):
    """A data domain, its derived layout params, a query box, and a
    sample point inside both the domain and the box (if any)."""
    amin = draw(_DAY)
    amax = draw(st.integers(min_value=amin, max_value=amin + 5000))
    bmin = draw(_CUST)
    bmax = draw(st.integers(min_value=bmin, max_value=bmin + 200_000))
    params = {
        "amin": amin,
        "aw": _bin_width(amin, amax),
        "bmin": bmin,
        "bw": _bin_width(bmin, bmax),
    }
    d1 = draw(st.integers(min_value=amin - 100, max_value=amax + 100))
    d2 = draw(st.integers(min_value=d1, max_value=amax + 200))
    c1 = draw(st.integers(min_value=bmin - 100, max_value=bmax + 100))
    c2 = draw(st.integers(min_value=c1, max_value=bmax + 200))
    # a data point inside domain ∩ box, when the intersection is
    # non-empty on both axes
    lo_a, hi_a = max(amin, d1), min(amax, d2)
    lo_b, hi_b = max(bmin, c1), min(bmax, c2)
    pt = None
    if lo_a <= hi_a and lo_b <= hi_b:
        pt = (
            draw(st.integers(min_value=lo_a, max_value=hi_a)),
            draw(st.integers(min_value=lo_b, max_value=hi_b)),
        )
    return params, amax, bmax, (d1, d2, c1, c2), pt


@given(_layout_and_box())
@settings(max_examples=300, deadline=None)
def test_every_in_box_point_lands_in_an_enumerated_cell(case):
    """THE pruning-correctness invariant: any data point inside the
    domain that matches the box predicate hashes into one of the
    enumerated z-cells — for arbitrary domains (including degenerate
    single-value axes) and boxes whose corners may fall outside the
    domain entirely."""
    params, amax, bmax, (d1, d2, c1, c2), pt = case
    cells = set(
        zcells_for_box(
            params,
            _EPOCH + dt.timedelta(days=d1),
            _EPOCH + dt.timedelta(days=d2),
            c1,
            c2,
        )
    )
    if pt is None:
        return  # box misses the domain on some axis — nothing to cover
    a, b = pt
    abin = (a - params["amin"]) // params["aw"]
    bbin = (b - params["bmin"]) // params["bw"]
    assert 0 <= abin < _BINS and 0 <= bbin < _BINS  # width invariant
    assert (_SPREAD[abin] + 2 * _SPREAD[bbin]) in cells


@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_bin_width_covers_domain_in_at_most_bins(lo, extent):
    """``_bin_width`` guarantees (x - lo) DIV w < _BINS for every x in
    [lo, hi] — the no-clamping-needed property the build relies on."""
    hi = lo + extent
    w = _bin_width(lo, hi)
    assert (hi - lo) // w < _BINS


def test_spread_is_a_bijection_onto_even_bit_positions():
    """The Morton spread table is injective and zcell = spread[a] +
    2*spread[b] is a bijection over the grid — no two (a, b) cells
    ever share a directory."""
    assert len(set(_SPREAD)) == _BINS
    zs = {
        _SPREAD[a] + 2 * _SPREAD[b]
        for a in range(_BINS)
        for b in range(_BINS)
    }
    assert len(zs) == _BINS * _BINS


@st.composite
def _band_and_value(draw):
    """Layout params, a purge band, a bin, and a custkey value the
    CLAMPED binning maps into that bin (edge bins absorb the whole
    out-of-grid tail, so values far outside the grid are legal)."""
    bmin = draw(_CUST)
    bmax = draw(st.integers(min_value=bmin, max_value=bmin + 200_000))
    params = {"amin": 0, "aw": 1, "bmin": bmin, "bw": _bin_width(bmin, bmax)}
    c1 = draw(st.integers(min_value=bmin - 10_000, max_value=bmax + 10_000))
    c2 = draw(st.integers(min_value=c1, max_value=bmax + 20_000))
    v = draw(
        st.integers(min_value=bmin - 500_000, max_value=bmax + 500_000)
    )
    bbin = min(_BINS - 1, max(0, (v - bmin) // params["bw"]))
    return params, c1, c2, bbin, v


@given(_band_and_value())
@settings(max_examples=300, deadline=None)
def test_fully_inside_band_never_drops_a_surviving_row(case):
    """THE wholesale-drop safety property (the round-12 review's
    edge-bin hazard, pinned): under CLAMPED binning, if
    _bbin_fully_inside_band says a bin may be dropped wholesale, then
    EVERY value the clamped binning maps into that bin lies inside
    the band — no survivor can be deleted by the no-read path. (The
    exact-binning flavor is the same claim restricted to in-grid
    values, which the clamped case subsumes.)"""
    from psd_project_spark.operators.zorder import _bbin_fully_inside_band

    params, c1, c2, bbin, v = case
    if _bbin_fully_inside_band(params, bbin, c1, c2, clamped=True):
        assert c1 <= v <= c2, (params, c1, c2, bbin, v)
