"""Remote project API: self-hosted server + typed client + RemoteFsProvider
+ CLI (≙ runmat-server-client over openapi/runmat-public.yaml — orgs,
projects, project fs, snapshots, history)."""

import os

import pytest

from runmat_tpu.remote import ProjectServer, PublicApiClient
from runmat_tpu.remote.client import RemoteApiError


@pytest.fixture()
def server(tmp_path):
    srv = ProjectServer(str(tmp_path / "store")).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    return PublicApiClient(server.base_url, token="")


def _mkproj(c):
    org = c.create_org("acme")
    proj = c.create_project(org["id"], "sim1")
    return org, proj


def test_auth_me(client):
    me = client.me()
    assert me["authenticated"] is True


def test_org_project_lifecycle(client):
    org, proj = _mkproj(client)
    assert [o["name"] for o in client.orgs()] == ["acme"]
    assert [p["name"] for p in client.projects(org["id"])] == ["sim1"]
    got = client.project(proj["id"])
    assert got["name"] == "sim1" and got["orgId"] == org["id"]
    # duplicate names conflict
    with pytest.raises(RemoteApiError) as ei:
        client.create_org("acme")
    assert ei.value.status == 409
    client.delete_project(proj["id"])
    with pytest.raises(RemoteApiError):
        client.project(proj["id"])


def test_fs_roundtrip(client):
    _, proj = _mkproj(client)
    pid = proj["id"]
    client.fs_mkdir(pid, "scripts")
    client.fs_write(pid, "scripts/run.m", b"x = 1:10; disp(sum(x))\n")
    assert client.fs_read(pid, "scripts/run.m").startswith(b"x = 1:10")
    entries = client.fs_dir(pid, "scripts")
    assert entries[0]["name"] == "run.m" and not entries[0]["isDir"]
    md = client.fs_metadata(pid, "scripts/run.m")
    assert md["size"] > 0 and not md["isDir"]
    client.fs_write(pid, "scripts/run.m", b"% more\n", append=True)
    assert client.fs_read(pid, "scripts/run.m").endswith(b"% more\n")
    client.fs_rename(pid, "scripts/run.m", "scripts/main.m")
    assert client.fs_read(pid, "scripts/main.m")
    client.fs_delete(pid, "scripts/main.m")
    with pytest.raises(RemoteApiError) as ei:
        client.fs_read(pid, "scripts/main.m")
    assert ei.value.status == 404


def test_path_escape_rejected(client):
    _, proj = _mkproj(client)
    with pytest.raises(RemoteApiError) as ei:
        client.fs_read(proj["id"], "../../orgs.json")
    assert ei.value.status in (400, 404)


def test_snapshot_create_restore(client):
    _, proj = _mkproj(client)
    pid = proj["id"]
    client.fs_write(pid, "a.m", b"version 1")
    snap = client.create_snapshot(pid, label="before-change")
    client.fs_write(pid, "a.m", b"version 2")
    assert client.fs_read(pid, "a.m") == b"version 2"
    client.restore_snapshot(pid, snap["id"])
    assert client.fs_read(pid, "a.m") == b"version 1"
    snaps = client.snapshots(pid)
    assert snaps[0]["label"] == "before-change"
    entries = client.snapshot_entries(pid, snap["id"])
    assert entries[0]["path"] == "a.m"
    tagged = client.tag_snapshot(pid, snap["id"], "v1")
    assert "v1" in tagged["tags"]
    client.delete_snapshot(pid, snap["id"])
    assert client.snapshots(pid) == []


def test_history_audit_log(client):
    _, proj = _mkproj(client)
    pid = proj["id"]
    client.fs_write(pid, "x.m", b"1")
    client.create_snapshot(pid)
    hist = client.history(pid)
    assert [h["op"] for h in hist] == ["write", "snapshot"]


def test_token_auth_enforced(tmp_path):
    srv = ProjectServer(str(tmp_path / "s2"), token="sekret").start()
    try:
        bad = PublicApiClient(srv.base_url, token="wrong")
        with pytest.raises(RemoteApiError) as ei:
            bad.orgs()
        assert ei.value.status == 401
        good = PublicApiClient(srv.base_url, token="sekret")
        assert good.orgs() == []
    finally:
        srv.stop()


def test_remote_fs_provider(server, client):
    _, proj = _mkproj(client)
    pid = proj["id"]
    from runmat_tpu.fs import RemoteFsProvider
    fs = RemoteFsProvider(server.base_url, pid, token="")
    fs.mkdir("data")
    fs.write_bytes("data/v.txt", b"hello")
    assert fs.exists("data/v.txt") and fs.is_file("data/v.txt")
    assert fs.is_dir("data") and not fs.is_dir("data/v.txt")
    assert fs.read_bytes("data/v.txt") == b"hello"
    assert fs.listdir("data") == ["v.txt"]
    assert fs.stat("data/v.txt")["size"] == 5
    with fs.open("data/w.txt", "w") as f:
        f.write("written via open()")
    with fs.open("data/w.txt", "r") as f:
        assert f.read() == "written via open()"
    fs.rename("data/v.txt", "data/v2.txt")
    assert not fs.exists("data/v.txt")
    fs.remove("data/v2.txt")
    assert not fs.exists("data/v2.txt")


def test_session_runs_script_from_remote_fs(server, client):
    """A session whose active fs provider is remote executes project
    scripts transparently (the io builtins route through fs())."""
    _, proj = _mkproj(client)
    pid = proj["id"]
    client.fs_write(pid, "job.m", b"r = sum(1:100);")
    from runmat_tpu.fs import RemoteFsProvider, set_fs_provider, \
        reset_fs_provider
    from runmat_tpu.session import Session
    try:
        set_fs_provider(RemoteFsProvider(server.base_url, pid, token=""))
        from runmat_tpu.fs import fs as active_fs
        src = active_fs().read_bytes("job.m").decode()
        s = Session(accelerate=False)
        s.run_source(src, "job.m")
        assert float(s.get("r").host()) == 5050.0
    finally:
        reset_fs_provider()


def test_cli_remote_commands(server, tmp_path, capsys, monkeypatch):
    from runmat_tpu import cli
    monkeypatch.setenv("RUNMAT_TPU_API_URL", server.base_url)
    assert cli.main(["remote", "org", "create", "cli-org"]) == 0
    out = capsys.readouterr().out
    import json
    org = json.loads(out)
    assert cli.main(["remote", "project", "create", org["id"], "p1"]) == 0
    proj = json.loads(capsys.readouterr().out)
    local = tmp_path / "f.m"
    local.write_text("disp(42)")
    assert cli.main(["remote", "fs", "put", proj["id"], str(local),
                     "f.m"]) == 0
    capsys.readouterr()
    assert cli.main(["remote", "fs", "ls", proj["id"]]) == 0
    assert "f.m" in capsys.readouterr().out
    assert cli.main(["remote", "snapshot", "create", proj["id"],
                     "first"]) == 0
    capsys.readouterr()
    assert cli.main(["remote", "snapshot", "list", proj["id"]]) == 0
    assert "first" in capsys.readouterr().out
    assert cli.main(["remote", "history", proj["id"]]) == 0
    assert "write" in capsys.readouterr().out


def test_cli_login_stores_token(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("HOME", str(tmp_path))
    from runmat_tpu import cli
    assert cli.main(["login", "http://example.local:1",
                     "--token", "tok123"]) == 0
    from runmat_tpu.remote import auth
    assert auth.resolve_token("http://example.local:1") == "tok123"
    auth.logout("http://example.local:1")
    assert auth.resolve_token("http://example.local:1") is None
