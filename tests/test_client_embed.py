"""Client-side embedding profile: the language front end runs with numpy
only — no jax import, no server — exactly what executing under Pyodide in
a browser requires (Pyodide ships numpy but not jax).

≙ reference runmat-wasm (crates/runmat-wasm/src/api/{init,session}.rs) +
bindings/ts in-browser mode; wheel build ≙ wasm-pack +
scripts/regenerate-wasm-registry.sh.
"""

import json
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

POISON = (
    "import sys;"
    "sys.modules['jax'] = None; sys.modules['jaxlib'] = None;"
)


def _run_py(code: str, cwd=None) -> subprocess.CompletedProcess:
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=120, cwd=cwd or str(REPO))


def test_client_profile_runs_with_jax_absent():
    r = _run_py(POISON + """
from runmat_tpu import client
res = client.run('A = magic(4); x = A \\\\ ones(4,1); disp(round(sum(x)*1e6)/1e6)')
assert res['ok'], res
print(res['output'].strip())
assert 'jax' not in sys.modules or sys.modules['jax'] is None
""")
    assert r.returncode == 0, r.stderr
    assert "0.1176" in r.stdout


def test_client_session_never_imports_accel_or_jax():
    # stronger than poisoning: jax IS importable here, but the client
    # profile must not touch it (structural absence, not luck). The axon
    # site hook preloads jax into every interpreter, so assert we don't
    # ADD it (or accel) rather than that it's absent.
    r = _run_py("""
import sys
pre_jax = 'jax' in sys.modules
from runmat_tpu import client
s = client.create_session()
res = s.execute('x = sort(rand(1000,1)); disp(issorted(x))')
assert res.ok, res.error
assert ('jax' in sys.modules) == pre_jax, 'client profile imported jax'
# the accel registry shim (engine=None) is jax-free; the jax-importing
# engine module must stay out
assert 'runmat_tpu.accel.engine' not in sys.modules, 'client imported engine'
print('clean')
""")
    assert r.returncode == 0, r.stderr
    assert "clean" in r.stdout


def test_client_wire_protocol_matches_server_ops():
    r = _run_py(POISON + """
import json
from runmat_tpu import client
def op(**kw):
    return json.loads(client.handle_json(json.dumps(kw)))
assert op(id=1, op='execute', source='v = linspace(0,1,5);')['ok']
ws = op(id=2, op='workspace')
assert ws['workspace']['v']['size'] == [1, 5]
got = op(id=3, op='get', name='v')
assert got['value']['value'][0][-1] == 1.0
hov = op(id=4, op='hover', name='v')
assert hov['hover']['on_device'] is False
bl = op(id=5, op='builtins', query='interp1')
assert any(b['name'] == 'interp1' for b in bl['builtins'])
chk = op(id=6, op='check', source='if true\\nend')
assert chk['ok']
fig = op(id=7, op='execute', source='surf(magic(8)); camlight;')
assert fig['ok']
figs = op(id=8, op='figures')
assert figs['ok'] and '<svg' in figs['figures'][0]['svg']
bad = op(id=9, op='no_such_op')
assert not bad['ok']
print('protocol ok')
""")
    assert r.returncode == 0, r.stderr
    assert "protocol ok" in r.stdout


def test_client_engine_info():
    r = _run_py(POISON + """
from runmat_tpu import client
info = client.engine_info()
assert info['profile'] == 'client'
assert info['accelerate'] is False
assert info['builtins'] > 1300
print('info ok')
""")
    assert r.returncode == 0, r.stderr


def test_client_cli_entry():
    r = subprocess.run(
        [sys.executable, "-c",
         POISON + "import runmat_tpu.client as c; raise SystemExit("
         "c.main(['-e', 'disp(7 * 6)']))"],
        capture_output=True, text=True, timeout=120, cwd=str(REPO))
    assert r.returncode == 0, r.stderr
    assert "42" in r.stdout


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    out = tmp_path_factory.mktemp("wheel")
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_client_wheel.py"),
         str(out)], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    return Path(r.stdout.strip())


def test_wheel_is_pure_python(wheel):
    assert wheel.name.endswith("py3-none-any.whl")
    with zipfile.ZipFile(wheel) as zf:
        names = zf.namelist()
        assert "runmat_tpu/client.py" in names
        assert "runmat_tpu/session.py" in names
        assert not any(n.endswith((".so", ".pyd", ".dylib")) for n in names)
        # RECORD covers every file (micropip validates hashes)
        record = zf.read([n for n in names if n.endswith("RECORD")][0])
        listed = {line.split(",")[0] for line in
                  record.decode().strip().splitlines()}
        assert set(names) == listed


def test_wheel_executes_jax_free_from_install_dir(wheel, tmp_path):
    target = tmp_path / "site"
    with zipfile.ZipFile(wheel) as zf:
        zf.extractall(target)
    code = (
        "import sys;"
        "sys.modules['jax'] = None; sys.modules['jaxlib'] = None;"
        f"sys.path.insert(0, {str(target)!r});"
        """
import runmat_tpu
assert runmat_tpu.__file__.startswith(sys.path[0]), runmat_tpu.__file__
from runmat_tpu import client
res = client.run('x = fft(ones(8,1)); disp(real(x(1)))')
assert res['ok'], res
print(res['output'].strip())
""")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "8" in r.stdout
