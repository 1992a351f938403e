"""CLI command layer: dispatcher, command semantics, end-to-end scripts."""

import os

import numpy as np
import pytest

from siriltpu.cli.commands import COMMANDS, process_command
from siriltpu.cli.main import make_state
from siriltpu.core.frame import Frame
from siriltpu.io import fits as fits_io
from siriltpu.testing.synth import make_sequence_frames, noise_frame


@pytest.fixture
def state(tmp_path):
    return make_state(str(tmp_path))


def put_image(state, data, name="img"):
    path = os.path.join(state.cwd, name + ".fit")
    fits_io.write_fits(path, Frame(data))
    assert process_command(state, f"load {name}") == 0
    return path


def test_command_table_coverage():
    """All reference command verbs exist (command.c:66-185)."""
    reference_verbs = [
        "addmax", "bg", "bgnoise", "cd", "cdg", "clearstar", "contrast",
        "cosme", "cosme_cfa", "crop", "ddp", "entropy", "exit", "extract",
        "fdiv", "fftd", "ffti", "fill", "fill2", "find_hot", "find_cosme",
        "find_cosme_cfa", "findstar", "fmedian", "fmul", "fixbanding",
        "gauss", "help", "histo", "iadd", "idiv", "imul", "isub", "load",
        "log", "ls", "mirrorx", "mirrory", "new", "nozero", "offset", "psf",
        "resample", "rmgreen", "rotate", "rotatepi", "satu", "save",
        "savebmp", "savejpg", "savepnm", "savetif", "savetif8", "select",
        "seqcrop", "seqfind_cosme", "seqfind_cosme_cfa", "seqpsf", "setcpu",
        "setmag", "setmagseq", "split", "stat", "stackall", "threshlo",
        "threshhi", "thresh", "unselect", "unsharp", "unsetmag",
        "unsetmagseq", "visu", "wavelet", "wrecons",
    ]
    missing = [v for v in reference_verbs if v not in COMMANDS]
    assert not missing, f"missing commands: {missing}"


def test_unknown_command(state):
    assert process_command(state, "definitelynotacommand") == 1


def test_load_stat_save(state):
    put_image(state, noise_frame(16, 20, seed=1, mean=1000, sigma=10))
    assert process_command(state, "stat") == 0
    assert any("Mean" in l for l in state.log_lines)
    assert process_command(state, "save out") == 0
    assert os.path.exists(os.path.join(state.cwd, "out.fit"))


def test_arithmetic_roundtrip(state):
    data = noise_frame(8, 8, seed=2, mean=5000, sigma=100)
    put_image(state, data, "a")
    fits_io.write_fits(os.path.join(state.cwd, "b.fit"),
                       Frame(np.full((1, 8, 8), 100, np.uint16)))
    assert process_command(state, "iadd b") == 0
    np.testing.assert_array_equal(
        state.image.data, np.clip(data.astype(int) + 100, 0, 65535))
    assert process_command(state, "isub b") == 0
    np.testing.assert_array_equal(state.image.data, data)


def test_undo_redo(state):
    data = noise_frame(8, 8, seed=3)
    put_image(state, data)
    process_command(state, "fmul 2.0")
    assert not np.array_equal(state.image.data, data)
    assert process_command(state, "undo") == 0
    np.testing.assert_array_equal(state.image.data, data)
    assert process_command(state, "redo") == 0
    assert not np.array_equal(state.image.data, data)


def test_crop_with_selection(state):
    put_image(state, noise_frame(20, 30, seed=4))
    process_command(state, "boxselect 5 4 10 8")
    assert process_command(state, "crop") == 0
    assert state.image.rx == 10
    assert state.image.ry == 8


def test_fftd_ffti_roundtrip(state):
    data = noise_frame(16, 16, seed=5, mean=3000, sigma=500)
    put_image(state, data)
    assert process_command(state, "fftd mod pha") == 0
    assert process_command(state, "ffti mod pha") == 0
    err = np.abs(state.image.data.astype(int) - data.astype(int)).max()
    assert err <= 1


def test_wavelet_wrecons_identity(state):
    data = noise_frame(64, 64, seed=6, mean=2000, sigma=300)
    put_image(state, data)
    assert process_command(state, "wavelet 3") == 0
    assert process_command(state, "wrecons 1 1 1") == 0
    err = np.abs(state.image.data.astype(int) - data.astype(int)).max()
    assert err <= 1


def test_find_hot_cosme_cycle(state, tmp_path):
    rng = np.random.default_rng(7)
    dark = np.clip(rng.normal(500, 5, (1, 32, 32)), 0, 65535).astype(np.uint16)
    dark[0, 10, 12] = 60000
    put_image(state, dark, "dark")
    assert process_command(state, "find_hot hotlist 3 3") == 0
    assert os.path.exists(os.path.join(state.cwd, "hotlist.lst"))
    light = np.clip(rng.normal(900, 5, (1, 32, 32)), 0, 65535).astype(np.uint16)
    light[0, 10, 12] = 65000
    put_image(state, light, "light")
    assert process_command(state, "cosme hotlist.lst") == 0
    assert abs(int(state.image.data[0, 10, 12]) - 900) < 60


def test_sequence_pipeline_script(state):
    """register dft + stack through the command layer (config-3 shape)."""
    frames, _, gen = make_sequence_frames(6, 64, 64, seed=8)
    for i, f in enumerate(frames):
        fits_io.write_fits(os.path.join(state.cwd, f"pl{i+1:03d}.fit"),
                           Frame(f))
    from siriltpu.io.sequence import check_seq
    check_seq(state.cwd)
    assert process_command(state, "seqload pl") == 0
    assert process_command(state, "boxselect 8 8 48 48") == 0
    assert process_command(state, "register dft") == 0
    assert process_command(state, "stack mean sigma 3 3") == 0
    assert os.path.exists(os.path.join(state.cwd, "pl_stacked.fit"))
    # shifts persisted in the .seq checkpoint
    from siriltpu.io.seqfile import read_seqfile
    seq = read_seqfile(os.path.join(state.cwd, "pl.seq"))
    got = seq.reg_shifts(0)
    # shifts are relative to the reference frame (frame 0)
    np.testing.assert_array_equal(got[:, 0], -(gen[:, 0] - gen[0, 0]))


def test_stackall(state):
    frames, _, _ = make_sequence_frames(3, 32, 32, seed=9,
                                        shifts=np.zeros((3, 2), int))
    for i, f in enumerate(frames):
        fits_io.write_fits(os.path.join(state.cwd, f"s{i+1:02d}.fit"),
                           Frame(f))
    assert process_command(state, "stackall") == 0
    assert os.path.exists(os.path.join(state.cwd, "s_stacked.fit"))


def test_convert_command(state):
    from siriltpu.io.formats import save_pnm
    for i in range(2):
        save_pnm(os.path.join(state.cwd, f"in{i}.ppm"),
                 Frame(noise_frame(8, 8, seed=i, nlayers=3)))
    assert process_command(state, "convert lights") == 0
    assert os.path.exists(os.path.join(state.cwd, "lights00001.fit"))


def test_save_formats(state):
    put_image(state, noise_frame(8, 8, seed=10, nlayers=3))
    # savebmp appends ".bmp" unconditionally like the reference
    # (command.c:246)
    for cmd, fname in [("savebmp out", "out.bmp"),
                       ("savejpg outj 90", "outj.jpg"),
                       ("savepnm outp", "outp.ppm"),
                       ("savetif outt", "outt.tif")]:
        assert process_command(state, cmd) == 0, cmd
        assert os.path.exists(os.path.join(state.cwd, fname)), fname


def test_script_runner(state, tmp_path):
    from siriltpu.cli.main import run_script
    put_image(state, noise_frame(8, 8, seed=11))
    script = tmp_path / "test.ssf"
    script.write_text("fmul 1.5\nsave scripted\n")
    assert run_script(state, str(script)) == 0
    assert os.path.exists(os.path.join(state.cwd, "scripted.fit"))


def test_full_scripted_session(state, tmp_path):
    """The verify-session flow: convert -> preprocess(dark,cosme) ->
    register -> normalized winsorized stack -> bgextract -> autostretch
    -> save/export, all through command verbs (regression for the
    seqload-discovery and -dark= extension-resolution bugs)."""
    from siriltpu.io.formats import save_pnm
    from siriltpu.io.fits import read_fits
    from siriltpu.cli.main import run_script

    d = state.cwd
    n, h, w = 4, 64, 64
    rng = np.random.default_rng(21)
    gen = rng.integers(-3, 4, size=(n, 2)); gen[0] = 0
    frames, _, _ = make_sequence_frames(n, h, w, seed=21, shifts=gen,
                                        noise_sigma=4.0)
    dark = np.clip(rng.normal(150, 3, (1, h, w)), 0, 65535).astype(np.uint16)
    for i in range(n):
        raw = np.clip(frames[i].astype(np.int64) + dark, 0,
                      65535).astype(np.uint16)
        save_pnm(os.path.join(d, f"raw{i+1:02d}.ppm"), Frame(raw))
    fits_io.write_fits(os.path.join(d, "master_dark.fit"), Frame(dark))
    script = tmp_path / "sess.ssf"
    script.write_text(
        "convert light\nseqload light\npreprocess -dark=master_dark\n"
        "seqload pp_light\nboxselect 8 8 48 48\nregister dft\n"
        "stack mean sigma 3 3\nautostretch\nsave final\n")
    assert run_script(state, str(script)) == 0
    assert os.path.exists(os.path.join(d, "final.fit"))
    assert os.path.exists(os.path.join(d, "pp_light_stacked.fit"))


def test_every_command_fails_cleanly_without_state(tmp_path):
    """Smoke: each of the 90+ verbs, invoked with no image/sequence
    loaded and zero args, either works or raises CommandError — never an
    unhandled exception (the reference prints a one-line usage/error)."""
    from siriltpu.cli.commands import COMMANDS, process_command
    from siriltpu.cli.main import make_state

    skipped = {"exit", "quit"}
    for verb in sorted(COMMANDS):
        if verb in skipped:
            continue
        state = make_state(str(tmp_path))
        # process_command catches CommandError and returns nonzero;
        # anything else propagating is a failure
        process_command(state, verb)


def test_convert_cr2_directory(tmp_path):
    """`convert` ingests .CR2 files (native decoder, no rawpy) into a
    Bayer FITS sequence with the vendor pattern in the header."""
    import numpy as np
    from siriltpu.cli.main import make_state
    from siriltpu.cli.commands import process_command
    from siriltpu.io import fits as fits_io
    from siriltpu.testing.cr2 import write_cr2

    d = str(tmp_path)
    rng = np.random.default_rng(30)
    planted = []
    for i in range(3):
        cfa = rng.integers(0, 1 << 14, (32, 48)).astype(np.uint16)
        planted.append(cfa)
        write_cr2(f"{d}/IMG_{i:04d}.CR2", cfa)
    state = make_state(d)
    assert process_command(state, "convert lights") == 0
    import glob
    outs = sorted(glob.glob(f"{d}/lights*.fit*"))
    assert len(outs) == 3
    img = fits_io.read_fits(outs[0])
    assert img.data.shape[0] == 1  # CFA mono
    np.testing.assert_array_equal(img.data[0], planted[0][::-1])


def test_register_global_verb_rgb_ser(tmp_path):
    """The `register global` verb drives the chunked engine on an RGB
    SER and produces the aligned r_ SER."""
    import numpy as np
    from siriltpu.cli.main import make_state
    from siriltpu.cli.commands import process_command
    from siriltpu.core.frame import Frame
    from siriltpu.io.ser import SER_RGB, SerFile
    from siriltpu.io.sequence import ser_sequence
    from siriltpu.testing.synth import starfield

    d = str(tmp_path)
    h = w = 128
    rng = np.random.default_rng(31)
    base = np.column_stack([
        rng.uniform(20, w - 20, 15), rng.uniform(20, h - 20, 15),
        rng.uniform(9000, 28000, 15), rng.uniform(4, 6, 15)])
    ser = SerFile.create(f"{d}/rgbl.ser", width=w, height=h,
                         color_id=SER_RGB)
    for i in range(4):
        st = base.copy()
        st[:, 0] += [0, 3, -4, 2][i]
        st[:, 1] += [0, -2, 3, -1][i]
        mono, _ = starfield(h, w, 15, seed=31, background=880,
                            noise_sigma=4.0, stars=st)
        ser.write_frame(Frame(np.repeat(mono, 3, axis=0)))
    ser.write_and_close()
    state = make_state(d)
    assert process_command(state, "seqload rgbl") == 0
    assert process_command(state, "register global") == 0
    rseq = ser_sequence(f"{d}/r_rgbl.ser")
    assert rseq.number == 4
    fr = rseq.read_frame(1)
    assert fr.data.shape == (3, h, w)
