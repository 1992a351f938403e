"""The BASELINE config-5 chain as ONE pipeline:

    SER convert → per-frame background extraction → register →
    mean-with-rejection stack → autostretch → FITS

Each stage is the same code the individual CLI verbs run (convert /
bgextract / register / stack / autostretch); this module owns the
WIRING — intermediate sequences, write-back naming (``bkg_``/``r_``
prefixes mirroring the reference's sequence-prefix convention,
e.g. seqpreprocess's ``pp_``, src/core/siril.c:1144), and the final
stretch+save — so the whole chain runs end to end with one call.

The reference has no single entry point for this chain (a user chains
GUI actions); the driver's BASELINE.json config 5 defines it as the
full-pipeline eval, which is what this reproduces.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from siriltpu.core.frame import Frame


@dataclass
class Config5Report:
    frames: int = 0
    registered: int = 0
    failed: int = 0
    output_path: str = ""
    autostretch_m: List[float] = field(default_factory=list)
    rejection_percent: tuple = (0.0, 0.0)
    stage_seconds: dict = field(default_factory=dict)
    # per-component times of the overlapped bgextract stage
    # (read_s + compute_s + save_s > wall_s when threads overlapped)
    overlap_seconds: dict = field(default_factory=dict)


def config5_pipeline(ser_path: str, *, layer: int = 1,
                     bg_order: int = 4,
                     register_method: str = "global",
                     rejection: str = "winsorized",
                     sig=(3.0, 3.0), normalize: str = "none",
                     output: Optional[str] = None,
                     debayer: bool = False,
                     mesh=None) -> Config5Report:
    """Run the full config-5 chain on an RGB (or to-debayer) SER.

    ``layer``: registration layer (green = 1 for RGB, the reference's
    usual choice). ``register_method``: ``global`` (star alignment,
    deep-sky) or ``dft`` (translation via phase correlation on a
    centered square selection). Returns a Config5Report; the stacked,
    background-subtracted, autostretched result is written to
    ``output`` (default ``<ser-dir>/<name>_result.fit``).
    """
    import time

    from siriltpu.core.frame import Rect
    from siriltpu.io import fits as fits_io
    from siriltpu.io.sequence import ser_sequence
    from siriltpu.io.ser import SerFile
    from siriltpu.ops.background import (BackgroundParams,
                                         subtract_background)
    from siriltpu.ops.histogram_ops import autostretch, find_midtones_balance
    from siriltpu.stacking.api import stack_sequence

    rep = Config5Report()
    t = time.perf_counter()

    def lap(name):
        nonlocal t
        now = time.perf_counter()
        rep.stage_seconds[name] = now - t
        t = now

    # 1) convert: open the SER as a sequence (debayering on read when
    # asked — the reference's convert + debayer_if_needed path)
    seq = ser_sequence(ser_path, debayer=debayer)
    rep.frames = seq.number
    seq.read_frame(0)
    lap("convert")

    # 2) per-frame background extraction into a new bkg_ SER (the
    # seq-apply form of bgextract, gradient.c's poly model per frame),
    # through the sequence engine: a reader thread prefetches the next
    # chunk and a writer thread encodes/writes results (incl. their
    # device->host fetch) while the device computes the current frame —
    # the reference's P5 loader pattern (ser.c:671-683) across the
    # stage's read/compute/write boundaries. rep.overlap_seconds
    # records the component times (read+compute+save > bgextract wall
    # when the overlap engaged).
    d = seq.seq_dir
    bkg_path = os.path.join(d, f"bkg_{seq.seqname}.ser")
    from siriltpu.io.ser import SER_MONO, SER_RGB
    from siriltpu.parallel.engine import SequenceEngine
    bkg = SerFile.create(bkg_path, width=seq.rx, height=seq.ry,
                         color_id=SER_MONO if seq.nb_layers == 1 else SER_RGB)
    bg_params = BackgroundParams(order=bg_order)
    eng = SequenceEngine(chunk=4)
    eng.map_frames(
        seq,
        lambda i, fr: Frame(subtract_background(fr.data, bg_params),
                            dict(fr.meta)),
        filter_fn=lambda i: True,
        save_hook=lambda i, out: bkg.write_frame(out),
        async_save=True, stats=rep.overlap_seconds)
    bkg.write_and_close()
    bseq = ser_sequence(bkg_path)
    lap("bgextract")

    # 3) register
    if register_method == "global":
        from siriltpu.registration.global_star import register_global_star
        greport = register_global_star(bseq, layer, mesh=mesh)
        rep.registered = greport.registered
        rep.failed = greport.failed
        rseq = ser_sequence(os.path.join(d, greport.new_seqname + ".ser"))
        shifts_layer = layer
    elif register_method == "dft":
        from siriltpu.registration.translation import register_shift_dft
        sq = min(512, seq.rx // 2, seq.ry // 2)
        register_shift_dft(bseq, layer, Rect((seq.rx - sq) // 2,
                                             (seq.ry - sq) // 2, sq, sq))
        rep.registered = bseq.number
        rseq = bseq
        shifts_layer = layer
    else:
        raise ValueError(f"unknown register method {register_method}")
    lap("register")

    # 4) rejection stack (blockwise streaming when large)
    res = stack_sequence(rseq, method="mean", layer_shifts=shifts_layer,
                         filter_type="all", rejection=rejection, sig=sig,
                         normalize=normalize)
    rep.rejection_percent = res.rejection_percent(0)
    lap("stack")

    # 5) autostretch (findMidtonesBalance + MTF, histogram.c:684-740)
    for c in range(res.data.shape[0]):
        m, lo, hi = find_midtones_balance(res.data[c:c + 1])
        rep.autostretch_m.append(m)
    stretched = autostretch(res.data)
    lap("autostretch")

    if output is None:
        output = os.path.join(d, f"{seq.seqname}_result.fit")
    fits_io.write_fits(output, Frame(stretched))
    rep.output_path = output
    lap("save")
    return rep


__all__ = ["config5_pipeline", "Config5Report"]
