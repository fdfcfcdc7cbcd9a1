"""The [M::fn::t*c] phase-log contract (reference: src/sys.cpp:92-117 and
the log lines scraped by data/postprocessing.py:50-76): phi_tpu.logging
must emit lines that phi_tpu.eval.scrape parses back."""

import re

from phi_tpu import logging as plog
from phi_tpu.eval.scrape import scrape_log


def _capture(fn, *args, **kw):
    import io
    import sys
    buf = io.StringIO()
    old = sys.stderr
    sys.stderr = buf
    try:
        fn(*args, **kw)
    finally:
        sys.stderr = old
    return buf.getvalue()


def test_log_line_shape():
    out = _capture(plog.log, "ILP_function", "Indexed reads with spectrum size: 42")
    m = re.match(r"^\[M::ILP_function::(\d+\.\d{3})\*(\d+\.\d{2})\] "
                 r"Indexed reads with spectrum size: 42\n$", out)
    assert m, out
    assert float(m.group(1)) >= 0.0


def test_footer_scrapes_back():
    out = _capture(plog.footer, "0.1.0", ["phi", "-g", "x.gfa"])
    assert "[M::main] PHI Version: 0.1.0" in out
    assert "[M::main] CMD: phi -g x.gfa" in out
    d = scrape_log(out)
    assert d["real_time"] >= 0.0
    assert d["peak_rss_gb"] > 0.0


def test_timer_monotonic_and_resettable():
    plog.reset_timer()
    t1 = plog.realtime()
    t2 = plog.realtime()
    assert 0.0 <= t1 <= t2
    assert plog.cputime() > 0.0
    assert plog.peakrss_gb() > 0.0
