"""Example-level acceptance tests (the reference CI's `--examples` run).

Thresholds come straight from the reference examples:
fm_disc.rs:151-157, ddc_lockin.rs:104-110,
polyphase_channelizer.rs:166-178.
"""

import numpy as np

from idsp_tpu.pipelines import channelizer, ddc_lockin, fm_disc


def test_fm_disc_tracks_known_modulation():
    r = fm_disc.run_fm_disc()
    assert r["corr"] > 0.999
    assert 0.95 < r["gain"] < 1.05
    assert r["rms"] < 5e-4


def test_ddc_recovers_dc_iq():
    r = ddc_lockin.run_ddc()
    assert abs(r["mean"][0] - r["expected"][0]) < 3e-3
    assert abs(r["mean"][1] - r["expected"][1]) < 3e-3
    assert r["rms"] < 6e-3


def test_channelizer_routes_center_tones():
    for freq, want in [(0.0, 0), (0.25, 1), (0.5, 2), (0.75, 3)]:
        p = channelizer.channel_powers(freq)
        assert int(np.argmax(p)) == want, (freq, p)
        others = np.delete(p, want)
        assert p[want] > 10.0 * others.max(), (freq, p)


def test_channelizer_wideband_64():
    # Scaled-up bank (towards the BASELINE #5 1024-channel config):
    # tones at channel centers land in their channel.
    m = 64
    for ch in (0, 7, 31, 63):
        p = channelizer.channel_powers(ch / m, m=m, taps=8, n=m * 512)
        assert int(np.argmax(p)) == ch
        others = np.delete(p, ch)
        assert p[ch] > 10.0 * others.max()


def test_channelizer_wideband_1024():
    # The BASELINE #5 headline channel count: a tone at a channel
    # center lands in its channel with overwhelming isolation.
    m = 1024
    p = channelizer.channel_powers(100 / m, m=m, taps=8, n=m * 160)
    assert int(np.argmax(p)) == 100
    others = np.delete(p, 100)
    assert p[100] > 1e4 * others.max()
