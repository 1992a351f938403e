"""Global star alignment (deep-sky registration).

Reference: ``register_star_alignment``
(src/registration/registration.c:525-784):

1. find stars on the reference frame (peaker), need >= 10
   (AT_MATCH_MINPAIRS), cap at MAX_STARS_FITTED = 2000 brightest
   (registration.c:55);
2. per frame: peaker → ``new_star_match`` (triangle vote + iterated
   TRANS) → RANSAC homography to the reference (3-px threshold);
3. warp the frame into the reference geometry (flip → warpPerspective →
   flip) and write it into a NEW sequence named ``<prefix><name>``
   (FITS files or one SER), with fresh imgparam/regparam carrying the
   frame's mean FWHM (:731-749);
4. in ``translation_only`` mode no warp happens: regdata stores
   shiftx = +h02, shifty = −h12 (:746-747, y sign flips because star
   coordinates are top-down while shift consumers are bottom-up).

Frames failing star detection or matching are dropped from the new
sequence (skip + new_total decrement, :683-690).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from siriltpu.core.frame import Frame, ImgParam, RegData
from siriltpu.ops.starfind import StarFinderParams, peaker
from siriltpu.ops.warp import (INTER_LINEAR, warp_frame_dev,
                               warp_layer_dev)
from siriltpu.registration.matching import (AT_MATCH_MINPAIRS,
                                            new_star_match)
from siriltpu.registration.ransac import find_homography

MAX_STARS_FITTED = 2000  # registration.c:55


@dataclass
class GlobalRegReport:
    registered: int = 0
    failed: int = 0
    new_seqname: str = ""
    homographies: List[Optional[np.ndarray]] = field(default_factory=list)
    fwhm: List[float] = field(default_factory=list)


def _fwhm_average(stars, n):
    if not stars:
        return 0.0, 0.0
    n = min(n, len(stars))
    fx = float(np.mean([s.fwhmx for s in stars[:n]]))
    fy = float(np.mean([s.fwhmy for s in stars[:n]]))
    return fx, fy


def compute_homography(stars_img, stars_ref, nbpoints: int
                       ) -> Optional[np.ndarray]:
    """new_star_match + RANSAC H (match.c:125-389 → cvCalculH)."""
    m = new_star_match(stars_img[:nbpoints], stars_ref[:nbpoints])
    if m is None:
        return None
    xy_img, xy_ref, _ = m
    res = find_homography(xy_img, xy_ref)
    if res is None:
        return None
    H, _ = res
    return H


def register_global_star(seq, layer: int, *, prefix: str = "r_",
                         interpolation: int = INTER_LINEAR,
                         translation_only: bool = False,
                         process_all_frames: bool = True,
                         sf_params: Optional[StarFinderParams] = None,
                         write_output: bool = True,
                         output_frames: Optional[list] = None
                         ) -> GlobalRegReport:
    """Run global star alignment over a Sequence.

    When ``write_output`` the aligned frames are written as a new
    sequence (``<prefix><seqname>``, FITS files or SER matching the
    input type); ``output_frames`` (a list) collects aligned Frames
    in-memory instead/additionally.
    """
    from siriltpu.io import fits as fits_io
    from siriltpu.io.seqfile import write_seqfile
    from siriltpu.io.sequence import Sequence
    from siriltpu.io.ser import SerFile

    report = GlobalRegReport(new_seqname=f"{prefix}{seq.seqname}")
    reg = seq.ensure_regparam(layer)
    ref_image = seq.reference_image if seq.reference_image >= 0 else 0

    ref_frame = seq.read_frame(ref_image)
    refstars = peaker(ref_frame.layer(layer), params=sf_params)
    if len(refstars) < AT_MATCH_MINPAIRS:
        raise ValueError(
            "There are not enough stars in reference image to perform alignment")
    fitted_stars = min(len(refstars), MAX_STARS_FITTED)
    fx, fy = _fwhm_average(refstars, fitted_stars)
    reg[ref_image].fwhm = fx
    out_h, out_w = ref_frame.ry, ref_frame.rx

    new_imgparam: List[ImgParam] = []
    new_regparam: List[RegData] = []
    new_ser = None
    written = 0
    pending = None   # (device_warp, host_frame, frame_idx, meta, fwhm)

    def _flush(p):
        """Materialize a warped frame (overlapped readback) and do its
        output bookkeeping, preserving frame order."""
        wdev, warped_host, fidx, meta, fwhm_val = p
        if warped_host is None:
            arr = np.asarray(wdev)
            warped = Frame(arr if arr.ndim == 3 else arr[None], meta)
        else:
            warped = warped_host
        if output_frames is not None:
            output_frames.append(warped)
        w = written
        if write_output:
            if new_ser is not None:
                new_ser.write_frame(warped)
                new_imgparam.append(ImgParam(filenum=w))
            else:
                dest = os.path.join(
                    seq.seq_dir,
                    f"{prefix}{seq.image_filename(fidx)}")
                fits_io.write_fits(dest, warped)
                new_imgparam.append(
                    ImgParam(filenum=seq.imgparam[fidx].filenum))
        new_regparam.append(RegData(fwhm=fwhm_val))
        return w + 1
    if write_output and seq.seqtype == "ser" and not translation_only:
        new_ser = SerFile.create(
            os.path.join(seq.seq_dir, report.new_seqname + ".ser"),
            width=out_w, height=out_h)

    todo = [i for i in range(seq.number)
            if process_all_frames or seq.imgparam[i].incl]
    # one-frame read-ahead with an async device_put of the star-find
    # layer: jax.device_put returns in ~10 ms and the transfer drains
    # while THIS frame's matching/flush runs, keeping the (serializing)
    # host link busy continuously
    prefetched = {}   # frame_idx -> (Frame, device layer)

    def _read(idx):
        if idx in prefetched:
            return prefetched.pop(idx)
        fr = seq.read_frame(idx)
        return fr, None

    for pos, frame_idx in enumerate(todo):
        frame, pre_dev = _read(frame_idx)
        if pos + 1 < len(todo):
            nidx = todo[pos + 1]
            nframe = seq.read_frame(nidx)
            ndev = None
            if nidx != ref_image:
                import jax
                ndev = jax.device_put(nframe.layer(layer))
            prefetched[nidx] = (nframe, ndev)
        mono = frame.nlayers == 1
        layer_dev = None
        H = np.eye(3)
        if frame_idx != ref_image:
            stars, layer_dev = peaker(frame.layer(layer), params=sf_params,
                                      return_device=True,
                                      layer_dev=pre_dev)
            if len(stars) < AT_MATCH_MINPAIRS:
                report.failed += 1
                report.homographies.append(None)
                continue
            nbpoints = min(len(stars), fitted_stars)
            H = compute_homography(stars, refstars, nbpoints)
            if H is None:
                report.failed += 1
                report.homographies.append(None)
                continue
            fx, fy = _fwhm_average(stars, nbpoints)
            reg[frame_idx].fwhm = fx

        report.homographies.append(H)
        report.fwhm.append(fx)

        if translation_only:
            reg[frame_idx].shiftx = int(round(H[0, 2]))
            reg[frame_idx].shifty = int(round(-H[1, 2]))
            seq.imgparam[frame_idx].incl = True
            report.registered += 1
            continue

        if frame_idx == ref_image:
            wdev = None
            warped_host = frame
        elif mono and layer_dev is not None:
            # the layer is already on device from star finding: warp it
            # there and read back uint16 (half the f32 intermediate) —
            # one host->device pass per frame instead of two
            wdev = warp_layer_dev(layer_dev, H, (out_h, out_w),
                                  interpolation)
            warped_host = None
        else:
            # multi-channel: one batched device program for all layers
            import jax.numpy as jnp
            wdev = warp_frame_dev(jnp.asarray(frame.data), H,
                                  (out_h, out_w), interpolation)
            warped_host = None
        if wdev is not None:
            # start the host transfer now; it drains while the NEXT
            # frame's star find runs (the link here is the bottleneck)
            try:
                wdev.copy_to_host_async()
            except AttributeError:
                pass
        if pending is not None:
            written = _flush(pending)
        pending = (wdev, warped_host, frame_idx, dict(frame.meta),
                   reg[frame_idx].fwhm)
        report.registered += 1

    if pending is not None:
        written = _flush(pending)
    if new_ser is not None:
        new_ser.write_and_close()

    if write_output and not translation_only and report.registered:
        # build and persist the new sequence (end_register_idle,
        # registration.c:1199-1244)
        new_seq = Sequence(
            seqname=report.new_seqname,
            seqtype="ser" if new_ser is not None else "regular",
            seq_dir=seq.seq_dir, number=report.registered,
            selnum=report.registered, fixed=seq.fixed, ext=seq.ext,
            nb_layers=seq.nb_layers, rx=out_w, ry=out_h,
            imgparam=new_imgparam, regparam={layer: new_regparam})
        write_seqfile(new_seq, seq.seq_dir)
    seq.needs_saving = True
    return report


def global_align_batch(layers_bu: np.ndarray, ref_index: int = 0, *,
                       interpolation: int = INTER_LINEAR,
                       sf_params: Optional[StarFinderParams] = None,
                       nmax: int = 1024, mesh=None):
    """Multi-chip global star alignment of an in-memory frame batch.

    The fully batched form of :func:`register_global_star`'s device
    work: ONE vmapped star-find program over all frames
    (:func:`siriltpu.ops.starfind.peaker_batch`), host triangle
    matching + RANSAC per frame, then ONE vmapped warp program — both
    device stages shard over a ``frames`` mesh axis so each chip
    processes its own frame subset (the reference's OpenMP-over-frames
    registration, registration.c:276-279, at chip scale; the warp and
    star find are frame-local so no collectives are needed).

    Returns ``(aligned, report)``: aligned (F, H, W) uint16 frames in
    reference geometry (failed frames pass through unwarped and are
    recorded in the report), and a GlobalRegReport with per-frame
    homographies (None on failure).
    """
    from siriltpu.ops.starfind import peaker_batch
    from siriltpu.ops.warp import warp_batch_dev

    layers_bu = np.asarray(layers_bu)
    f, h, w = layers_bu.shape
    report = GlobalRegReport()

    star_lists = peaker_batch(layers_bu, params=sf_params, nmax=nmax,
                              mesh=mesh)
    refstars = star_lists[ref_index]
    if len(refstars) < AT_MATCH_MINPAIRS:
        raise ValueError(
            "There are not enough stars in reference image to perform alignment")
    fitted_stars = min(len(refstars), MAX_STARS_FITTED)

    Hs = np.tile(np.eye(3), (f, 1, 1))
    for i in range(f):
        if i == ref_index:
            report.homographies.append(np.eye(3))
            report.registered += 1
            continue
        stars = star_lists[i]
        if len(stars) < AT_MATCH_MINPAIRS:
            report.failed += 1
            report.homographies.append(None)
            continue
        nbpoints = min(len(stars), fitted_stars)
        H = compute_homography(stars, refstars, nbpoints)
        if H is None:
            report.failed += 1
            report.homographies.append(None)
            continue
        Hs[i] = H
        report.homographies.append(H)
        report.registered += 1

    import jax
    import jax.numpy as jnp
    dev = jnp.asarray(layers_bu)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        dev = jax.device_put(dev, NamedSharding(mesh, P("frames")))
    aligned = np.asarray(warp_batch_dev(dev, Hs, (h, w), interpolation))
    return aligned, report


__all__ = ["register_global_star", "global_align_batch",
           "compute_homography", "GlobalRegReport", "MAX_STARS_FITTED"]
