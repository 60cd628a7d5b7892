"""The runnable demos keep passing their reference acceptance gates.

Each example's main() returns 0 on PASS (the same thresholds the
reference embeds in its examples' #[cfg(test)] blocks) — running them
here keeps the demos from rotting.
"""

import runpy
import sys

import pytest


@pytest.mark.parametrize(
    "script,argv",
    [
        ("examples/fm_radio.py", ["fm_radio.py", "4096"]),
        ("examples/lockin.py", ["lockin.py", "16384"]),
        ("examples/channelizer.py", ["channelizer.py", "16"]),
        ("examples/rate_converter.py", ["rate_converter.py", "8192"]),
    ],
)
def test_example_passes(script, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit) as e:
        runpy.run_path(script, run_name="__main__")
    assert e.value.code == 0


def test_stream_example_passes(monkeypatch):
    monkeypatch.setattr(
        sys, "argv", ["stream_ddc_bank.py", "128", "2"]
    )
    with pytest.raises(SystemExit) as e:
        runpy.run_path("examples/stream_ddc_bank.py", run_name="__main__")
    assert e.value.code == 0
