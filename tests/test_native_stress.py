"""Concurrency stress for the native runtime (SPSC sample ring + MPSC log
backend): builds and runs native/stress_main.cpp, plain and — when the
toolchain supports it — under ThreadSanitizer (the reference's
ENABLE_ASAN/ENABLE_MSAN role, CMakeLists.txt:84-87, made an executable
check instead of a build option)."""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")


def _make(target: str) -> str:
    subprocess.run(["make", target], cwd=NATIVE, check=True,
                   capture_output=True, timeout=120)
    return os.path.join(NATIVE, target)


@pytest.mark.skipif(shutil.which("make") is None or shutil.which("g++") is None,
                    reason="native toolchain unavailable")
def test_native_stress_plain(tmp_path):
    exe = _make("stress")
    r = subprocess.run([exe, str(tmp_path / "sink.log")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all native stress checks passed" in r.stderr


def _tsan_available() -> bool:
    if shutil.which("g++") is None:
        return False
    probe = "int main(){return 0;}"
    r = subprocess.run(
        ["g++", "-fsanitize=thread", "-x", "c++", "-", "-o", "/dev/null"],
        input=probe, capture_output=True, text=True, timeout=60)
    return r.returncode == 0


@pytest.mark.skipif(not _tsan_available(), reason="TSAN unavailable")
def test_native_stress_tsan(tmp_path):
    exe = _make("stress_tsan")
    r = subprocess.run([exe, str(tmp_path / "sink.log")],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ThreadSanitizer" not in r.stderr, r.stderr[-2000:]
    assert "all native stress checks passed" in r.stderr
