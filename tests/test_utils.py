"""Config / log / trace utilities."""

import json

from flydog_sdr_gps_tpu.utils import Config, EventTrace, LogRing


def test_config_defaults_and_accessors(tmp_path):
    c = Config()
    assert c.string("rx_name") == "flydog_sdr_gps_tpu"
    assert c.float("init.freq") == 7100.0
    assert c.int("init.zoom") == 4
    assert c.get("nope.deep", "dflt") == "dflt"
    seq0 = c.seq
    c.set("init.freq", 14200.0)
    assert c.float("init.freq") == 14200.0
    assert c.seq == seq0 + 1


def test_config_file_round_trip(tmp_path):
    p = tmp_path / "kiwi.json"
    c = Config(str(p))
    c.set("rx_name", "testbox")
    c.save()
    c2 = Config(str(p))
    assert c2.string("rx_name") == "testbox"
    # defaults still merged underneath
    assert c2.int("init.zoom") == 4


def test_log_ring():
    lr = LogRing(depth=4, mirror=None)
    for i in range(10):
        lr.write(f"line{i}")
    tail = lr.tail()
    assert len(tail) == 4 and tail[-1].endswith("line9")


def test_event_trace_spans():
    tr = EventTrace()
    tr.ev("SND", "start")
    tr.ev("SND", "end")
    tr.ev("WF", "start")
    tr.ev("SND", "start")
    tr.ev("SND", "end")
    spans = tr.spans("SND", "start", "end")
    assert len(spans) == 2 and all(s >= 0 for s in spans)
    assert len(tr.dump()) == 5


def test_security_password_hash_and_token():
    from flydog_sdr_gps_tpu.utils import security
    h = security.hash_password("hunter2", iters=1000)
    assert security.is_hashed(h)
    assert security.verify_password("hunter2", h)
    assert not security.verify_password("hunter3", h)
    # legacy plaintext comparison still works
    assert security.verify_password("abc", "abc")
    assert not security.verify_password("abc", "abd")
    # HMAC tokens: valid inside the window, expired outside, and
    # tamper-evident
    key = security.generate_authkey()
    tok = security.make_token(key, t=1000.0)
    assert security.check_token(key, tok, window_s=30, now=1010.0)
    assert not security.check_token(key, tok, window_s=30, now=1040.0)
    assert not security.check_token(key, tok + "0", now=1010.0)
    assert not security.check_token("otherkey", tok, now=1010.0)
    assert not security.check_token(key, "garbage", now=1010.0)
