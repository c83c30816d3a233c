"""Microstructure Fingerprinting user API (DIPY-style model / fit objects).

Behavioral equivalent of the reference mf.py: ``MFModel`` (mf.py:464-1051),
``MFModelFit`` (mf.py:1054-1229) and ``cleanup_2fascicles`` (mf.py:36-335),
re-architected for TPU:

  * model init precomputes device-resident interpolation tables once
    (reference builds scipy interpolators, mf.py:506-509);
  * ``fit`` marshals inputs on the host exactly like the reference
    (paths / arrays / scalars accepted everywhere), then groups masked
    voxels by configuration (number of fascicles, CSF, EAR) and runs the
    fused rotation+solve device step over fixed-size voxel batches —
    replacing the multiprocessing.Pool voxel loop (mf.py:978-1028);
  * optional ``parallel=True`` shards voxel batches across the jax device
    mesh (data parallelism; the dictionary is replicated).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..utils import io as mfio
from ..utils import nifti
from ..utils import scheme as schm
from ..utils import checks
from ..ops import interp as mfi
from ..ops import dti
from . import fit as fit_mod


def _load_volume(source, want_affine=False):
    if isinstance(source, (str, os.PathLike)):
        img = nifti.load(source)
        return (img.get_fdata(), img.affine) if want_affine \
            else (img.get_fdata(), None)
    return np.asarray(source), None


def cleanup_2fascicles(frac1, frac2, peakmode, mu1, mu2, mask, frac12=None):
    """Clean up detected fascicle orientations ("peaks").

    Selects 0, 1 or 2 of the 2 detected peaks per voxel and updates their
    orientations based on the fascicle weights and crossing angles, removing
    spurious peaks (method of Rensonnet et al., NeuroImage 2019; reference
    mf.py:36-335 with the same thresholds).

    Returns (peaks_out (..., 6), num_fasc_out (...)).
    """
    cfg = config.DEFAULTS["cleanup"]
    ratio = cfg.ratio      # fraction ratio above which the small peak drops
    w_keep = cfg.w_keep    # relative weight that always survives
    w_small = cfg.w_small  # absolute weight below which a fascicle drops
    ang_min = cfg.ang_min_deg  # merge angle [deg]

    if (frac1 is None or frac2 is None) and frac12 is None:
        raise ValueError(
            "If fractions of first and second fascicles set to None,"
            " argument frac12 is required to specify both fractions"
            " simultaneously. A total of 6 arguments should be passed,"
            " not 5.")

    mask, _ = _load_volume(mask)
    if frac1 is not None:
        frac1, _ = _load_volume(frac1)
    if frac2 is not None:
        frac2, _ = _load_volume(frac2)
    if frac12 is not None:
        frac12, _ = _load_volume(frac12)
        if frac12.shape[-1] < 2:
            raise ValueError("Last dimension of frac12 should have size"
                             " at least 2.")
        if frac12.shape[mask.ndim] == 1:  # (..., 1, 2) singleton axis
            frac1 = frac12[..., 0, 0]
            frac2 = frac12[..., 0, 1]
        else:
            frac1 = frac12[..., 0]
            frac2 = frac12[..., 1]

    if frac1.shape != mask.shape:
        raise ValueError("frac1 should have the same shape as mask")
    if frac2.shape != mask.shape:
        raise ValueError("frac2 should have the same shape as mask")

    mu1, _ = _load_volume(mu1)
    mu2, _ = _load_volume(mu2)

    if peakmode == 'colat_longit':
        lastdimsize = 2
    elif peakmode == 'peaks':
        lastdimsize = 3
    elif peakmode == 'tensor':
        lastdimsize = 6
        # tensor volumes often carry a singleton next-to-last axis
        if mu1.shape[mask.ndim] == 1:
            mu1 = mu1[..., 0, :]
        if mu2.shape[mask.ndim] == 1:
            mu2 = mu2[..., 0, :]
    else:
        raise ValueError('Unknown peak mode %s' % peakmode)
    if mu1.shape[-1] != lastdimsize or mu2.shape[-1] != lastdimsize:
        raise ValueError('In \'%s\' peak mode, last dimension of mu1 and mu2'
                         ' should have size %d. Detected %d and %d.'
                         % (peakmode, lastdimsize,
                            mu1.shape[-1], mu2.shape[-1]))

    in_mask = mask > 0
    ROI_size = int(np.sum(in_mask))
    frac1 = frac1[in_mask]
    frac2 = frac2[in_mask]
    mu1 = mu1[in_mask]
    mu2 = mu2[in_mask]
    max_peaks = 2

    frac = np.zeros((ROI_size, max_peaks))
    frac[:, 0] = frac1
    frac[:, 1] = frac2
    peaks = np.zeros((ROI_size, 3 * max_peaks))
    num_fasc = np.ones(ROI_size) * max_peaks

    if peakmode == 'colat_longit':
        for (m, st) in ((mu1, 0), (mu2, 3)):
            peaks[:, st + 0] = np.sin(m[..., 0]) * np.cos(m[..., 1])
            peaks[:, st + 1] = np.sin(m[..., 0]) * np.sin(m[..., 1])
            peaks[:, st + 2] = np.cos(m[..., 0])
    elif peakmode == 'peaks':
        peaks[:, :3] = mu1
        peaks[:, 3:6] = mu2
    else:  # tensor
        peaks[:, :3] = dti.principal_eigenvectors(
            dti.DT_vec_to_2Darray(mu1, order='column'))
        peaks[:, 3:6] = dti.principal_eigenvectors(
            dti.DT_vec_to_2Darray(mu2, order='column'))

    # The cleanup itself operates on (ROI, 2) weights and (ROI, 2, 3)
    # orientations as three branchless `where` rewrites (merge, dominance
    # transfer, absolute floor) + a sort; the reference applies the same
    # rules through sequential boolean fancy-indexing (mf.py:228-328).
    pk = peaks.reshape(ROI_size, max_peaks, 3)
    w = frac

    # 1) crossing angle below ang_min: the two directions describe one
    # fascicle. Slot 0 becomes the (antipodally aligned) resultant of the
    # pair, carries the summed weight, and slot 1 empties.
    cosang = np.clip(np.einsum("vd,vd->v", pk[:, 0], pk[:, 1]), -1.0, 1.0)
    near = np.abs(cosang) > np.cos(np.deg2rad(ang_min))
    resultant = pk[:, 0] + np.where(cosang < 0, -1.0, 1.0)[:, None] * pk[:, 1]
    rlen = np.linalg.norm(resultant, axis=1, keepdims=True)
    resultant = resultant / np.where(rlen > 0, rlen, 1.0)
    pk = np.where(near[:, None, None],
                  np.stack([resultant, np.zeros_like(resultant)], axis=1),
                  pk)
    w = np.where(near[:, None],
                 np.stack([w.sum(axis=1), np.zeros(ROI_size)], axis=1), w)

    # 2) relative dominance: a slot whose weight is both below w_keep and
    # out-weighed ratio-fold by the other slot is discarded. When slot 0
    # is the one discarded, slot 1 takes its place first (the surviving
    # fascicle always lives in slot 0).
    dominated = (ratio * w < w[:, ::-1]) & (w < w_keep)
    promote = dominated[:, 0]
    pk = np.where(promote[:, None, None], pk[:, ::-1], pk)
    w = np.where(promote[:, None], w[:, ::-1], w)
    lone = dominated.any(axis=1)
    pk[lone, 1] = 0.0
    w[lone, 1] = 0.0

    # 3) absolute floor: weights below w_small vanish entirely
    faint = w < w_small
    pk = np.where(faint[:, :, None], 0.0, pk)
    w = np.where(faint, 0.0, w)

    # a fascicle survives iff its weight is still positive; each rule
    # above keeps num_fasc equal to that count (pinned against the
    # reference's per-step bookkeeping by tests/test_fit.py and the C001
    # DIAMOND cleanup golden maps)
    num_fasc = (w > 0).sum(axis=1).astype(float)

    # 4) order the surviving peak triples by descending weight
    order = np.argsort(w, axis=1)[:, ::-1]
    peaks = np.take_along_axis(pk, order[:, :, None],
                               axis=1).reshape(ROI_size, 3 * max_peaks)

    peaks_out = np.zeros(mask.shape + (6,))
    peaks_out[in_mask] = peaks
    num_fasc_out = np.zeros(mask.shape)
    num_fasc_out[in_mask] = num_fasc
    return peaks_out, num_fasc_out


class MFModel(object):
    """Microstructure Fingerprinting model (reference mf.py:464-514).

    Parameters
    ----------
    dictionary : str or dict
        Path to a Matlab .mat file or an equivalent Python dict. Expected
        keys (reference data contract, SURVEY.md section 2.8): ``dictionary``
        (Nseq_dense, num_atom), ``sch_mat`` (Nseq_dense, 7), ``orientation``
        (3,), ``num_atom``, ``num_ear``, ``fasc_propnames`` plus one per-atom
        array per property, ``T2_csf``/``DIFF_csf`` and ``T2_ear``/
        ``DIFF_ear`` for the optional compartments.
    """

    MAX_FASC = config.DEFAULTS["fit"].max_fasc
    MAX_PROG_LINES = config.DEFAULTS["fit"].max_prog_lines
    DFT_DISP_ITVL = config.DEFAULTS["fit"].dft_disp_itvl
    DEFAULT_BATCH = config.DEFAULTS["fit"].batch

    def __init__(self, dictionary):
        if isinstance(dictionary, str):
            self.dic = mfio.loadmat(dictionary)
        elif isinstance(dictionary, dict):
            self.dic = dictionary
        else:
            raise ValueError("Dictionary should either be a valid path to a"
                             " Matlab-like mat file or a Python dictionary.")
        dic = self.dic
        from .. import enable_compile_cache
        enable_compile_cache()
        self.num_atom = int(dic.get("num_atom",
                                    np.shape(dic["dictionary"])[1]))
        self.num_ear = int(dic.get("num_ear",
                                   np.size(dic.get("DIFF_ear",
                                                   dic.get("Dear", [])))))
        # Device-resident interpolation tables, computed once.
        self.ms_interpolator = mfi.init_PGSE_multishell_interp(
            dic["dictionary"], dic["sch_mat"], dic["orientation"])
        # grouped-rotation evaluators are jitted closures: cache them per
        # target scheme so repeated fit() calls reuse compiled programs
        self._rotators = {}
        # Pallas-kernel health, scoped to this model: a Mosaic compile
        # failure degrades this model's later buckets to the XLA scans
        # without leaking the degradation to unrelated models
        self._kernel_health = fit_mod.KernelHealth()
        print("Initiated model based on dictionary with %d single-fascicle"
              " fingerprint(s) and %d fingerprint(s) for the extra-axonal"
              " restricted (EAR) compartment." %
              (self.num_atom, self.num_ear))

    def _grouped_rotator(self, plan_h, sch_mat):
        key = hash(np.asarray(sch_mat, dtype=np.float64).tobytes())
        rot = self._rotators.get(key)
        if rot is None:
            # (evaluator, perm) pair: the permutation-free grouped rotation
            rot = mfi.make_grouped_rotation_paired(self.ms_interpolator,
                                                   plan_h)
            self._rotators[key] = rot
        return rot

    # -- host marshalling helpers -------------------------------------

    def _propnames(self):
        raw = self.dic.get("fasc_propnames", [])
        if isinstance(raw, str):
            raw = [raw]
        return [str(x).strip() for x in np.atleast_1d(raw)]

    def fit(self,
            data, mask, numfasc, *,
            peaks=None, colat_longit=None, tensors=None,
            pgse_scheme=None, bvals=None, bvecs=None,
            csf_mask=None, ear_mask=None,
            verbose=1, parallel=False, batch_size=None, refine=None,
            topm=16, engine="auto", mesh_shape=None):
        """Fit the fingerprinting model in every masked voxel.

        Same argument contract as the reference ``MFModel.fit``
        (mf.py:516-616): every array argument also accepts a NIfTI path
        (and scalars for masks / numfasc). ``parallel=True`` shards voxel
        batches over all jax devices instead of spawning processes;
        ``mesh_shape=(n_data, n_atoms)`` optionally shapes the device mesh
        (default: pure data parallelism over all devices). With
        ``n_atoms > 1`` the 2-fascicle+CSF candidate scan additionally
        shards the second sub-dictionary's atom axis (tensor parallelism
        with an offset-corrected global first-minimum;
        parallel/mesh.sharded_df3_candidates).
        ``refine`` selects float64 host re-scoring of the accelerator's
        top-M candidates (default: enabled exactly when jax runs in float32,
        i.e. on TPU, where it restores reference float64 selection quality).
        ``engine`` picks the device scan: 'fast' (alias 'pallas') is the
        double-float fast path — grouped-matmul rotation + compensated
        candidate scans whose selection already matches float64; 'xla'
        is the general tiled scan (any K / EAR size) with a ``topm``-deep
        candidate pool; 'auto' uses the fast path for the configurations
        it covers. Run under JAX_ENABLE_X64=1 for bit-level reference
        parity. Returns an :class:`MFModelFit`.
        """
        VRB = verbose
        nii_affine = None

        # ---- data & mask ----
        if isinstance(data, (str, os.PathLike)):
            st_0 = time.time()
            if VRB >= 2:
                print("Loading data from file %s..." % data)
            img = nifti.load(data)
            nii_affine = img.affine
            data_arr = img.get_fdata()
            if VRB >= 2:
                print("Data loaded in %g s." % (time.time() - st_0))
        else:
            data_arr = np.asarray(data)

        if isinstance(mask, (str, os.PathLike)):
            img = nifti.load(mask)
            if nii_affine is None:
                nii_affine = img.affine
            mask_arr = img.get_fdata()
        else:
            mask_arr = np.asarray(mask)

        img_shape = mask_arr.shape
        in_mask = mask_arr > 0
        ROI_size = int(np.sum(in_mask))
        if ROI_size == 0:
            raise ValueError("No voxel detected in mask. Please provide "
                             "a non-empty mask.")
        if data_arr.shape[:-1] != img_shape:
            raise ValueError("Data and mask not compatible. Based on data,"
                             " mask should have shape (%s), got (%s)"
                             " instead." %
                             (" ".join("%d" % x for x in data_arr.shape[:-1]),
                              " ".join("%d" % x for x in img_shape)))

        # ---- number of fascicles ----
        if np.isscalar(numfasc) and not isinstance(numfasc, str):
            numfasc_roi = np.full(ROI_size, int(numfasc), dtype=int)
        else:
            if isinstance(numfasc, (str, os.PathLike)):
                numfasc_roi = nifti.load(numfasc).get_fdata()
            else:
                numfasc_roi = np.asarray(numfasc)
            if mask_arr.shape != numfasc_roi.shape:
                raise ValueError("Data and argument numfasc not compatible."
                                 "  Based on data, numfasc should have "
                                 "shape (%s), got (%s) instead." %
                                 (" ".join("%d" % x for x in img_shape),
                                  " ".join("%d" % x
                                           for x in numfasc_roi.shape)))
            numfasc_roi = numfasc_roi[in_mask].astype(int)
        maxfasc = int(np.max(numfasc_roi)) if numfasc_roi.size else 0
        if maxfasc > MFModel.MAX_FASC:
            raise ValueError("Detected %d mask voxel(s) in numfasc with"
                             " number of axon populations greater than"
                             " allowed maximum of %d." %
                             (int(np.sum(numfasc_roi > MFModel.MAX_FASC)),
                              MFModel.MAX_FASC))

        # ---- fascicle directions (peaks / colat_longit / tensors) ----
        peaks_roi = self._marshal_peaks(peaks, colat_longit, tensors,
                                        in_mask, img_shape, mask_arr,
                                        maxfasc, ROI_size, VRB)
        if isinstance(peaks_roi, tuple):  # affine came back with it
            peaks_roi, aff = peaks_roi
            if nii_affine is None:
                nii_affine = aff

        # every declared population must have a non-zero direction
        for i in range(maxfasc):
            n = i + 1
            sel = numfasc_roi >= n
            peak_L1 = np.sum(np.abs(peaks_roi[sel, (n - 1) * 3:3 * n]),
                             axis=1)
            num_0 = int(np.sum(peak_L1 == 0))
            if num_0 > 0:
                raise ValueError("Detected %d voxel(s) in which the main "
                                 "orientation of axon population %d/%d was "
                                 "a zero vector, although numfasc "
                                 "specifies the presence of that "
                                 "population." % (num_0, n, maxfasc))

        # ---- acquisition scheme ----
        if pgse_scheme is not None:
            if isinstance(pgse_scheme, (str, os.PathLike)):
                pgse_scheme = schm.load_scheme_text(pgse_scheme)
            pgse_scheme = np.asarray(pgse_scheme, dtype=np.float64)
            if pgse_scheme.shape[1] != 7:
                raise ValueError("pgse_scheme should have 7 columns, "
                                 " detected %d instead." %
                                 (pgse_scheme.shape[1],))
        else:
            if bvals is None or bvecs is None:
                raise TypeError("If no schemefile is provided, then both"
                                " bvals and bvecs must be specified.")
            pgse_scheme = schm.get_PGSE_scheme_from_bval_bvec_dense(
                self.dic["sch_mat"], bvals, bvecs, Gtol=1e-3)
        num_seq = pgse_scheme.shape[0]
        if data_arr.shape[-1] != num_seq:
            raise ValueError("Data has %d volumes along its last dimension "
                             "but the acquisition scheme describes %d "
                             "sequences." % (data_arr.shape[-1], num_seq))
        b = schm.b_values(pgse_scheme)
        TE = pgse_scheme[:, 6]

        # ---- optional compartment masks ----
        csf_mask_roi, aff = self._marshal_flag_mask(
            csf_mask, "csf_mask", in_mask, img_shape, ROI_size)
        if nii_affine is None:
            nii_affine = aff
        ear_mask_roi, aff = self._marshal_flag_mask(
            ear_mask, "ear_mask", in_mask, img_shape, ROI_size)
        if nii_affine is None:
            nii_affine = aff
        csf_on = bool(np.any(csf_mask_roi))
        ear_on = bool(np.any(ear_mask_roi))

        n_empty = int(np.sum((numfasc_roi + csf_mask_roi
                              + ear_mask_roi) == 0))
        if n_empty > 0 and VRB >= 2:
            print("WARNING: detected %d voxel(s) in mask with zero "
                  " axon population, no cerebrospinal fluid (CSF) and no"
                  " extra-axonal restricted (EAR) compartment specified."
                  " No estimation will be performed there." % (n_empty,))

        # ---- subject-specific CSF / EAR fingerprints ----
        sig_csf = None
        sig_ear = None
        if csf_on:
            sig_csf = (np.exp(-TE / self.dic["T2_csf"])
                       * np.exp(-b * self.dic["DIFF_csf"]))
        if ear_on:
            DIFF_ear = np.atleast_1d(self.dic["DIFF_ear"])
            sig_ear = (np.exp(-TE / self.dic["T2_ear"])[:, None]
                       * np.exp(-b[:, None] * DIFF_ear[None, :]))

        # ---- device plan ----
        plan_h = mfi.plan_target_scheme(self.ms_interpolator, pgse_scheme)
        tables = self.ms_interpolator.device_tables()
        dtype = tables[0].dtype
        plan = (jnp.asarray(plan_h.gdir, dtype=dtype),
                jnp.asarray(plan_h.shell_lo),
                jnp.asarray(plan_h.shell_hi),
                jnp.asarray(plan_h.wG, dtype=dtype))

        # ---- bucket voxels by configuration and run the device steps ----
        y_roi = data_arr[in_mask]  # (ROI_size, Nseq), np.where ordering
        num_params = 1 + maxfasc * 2 + csf_on * 1 + ear_on * 2 + 2
        params = np.zeros((ROI_size, num_params))
        i_csf = 2 * maxfasc + 1
        i_ear = 2 * maxfasc + csf_on + 1
        i_mse = 2 * maxfasc + csf_on + 2 * ear_on + 1
        i_r2 = i_mse + 1

        if refine is None:
            # float64-exact selection is only needed when the device scan
            # runs in float32 (x64 disabled)
            refine = not jax.config.jax_enable_x64
        batch = batch_size or MFModel.DEFAULT_BATCH
        mesh = None
        if parallel and len(jax.devices()) > 1:
            from ..parallel import mesh as pmesh
            if mesh_shape is not None:
                n_data_req, n_atoms_req = (int(x) for x in mesh_shape)
                mesh = pmesh.build_mesh(n_data=n_data_req,
                                        n_atoms=n_atoms_req)
            else:
                mesh = pmesh.build_mesh(n_atoms=1)
            n_data = mesh.shape["data"]
            batch = max(batch // n_data, 1) * n_data  # divisible chunks
        st_est = time.time()
        if VRB >= 2:
            print("Starting estimation in %d voxel(s) in %s mode." %
                  (ROI_size,
                   "device-parallel (%d devices)" % len(jax.devices())
                   if mesh is not None else "batched"))

        # degenerate-data guard: voxels with NaN/Inf signals are excluded
        # (their parameter rows stay zero) instead of poisoning a batch
        bad_vox = checks.check_finite_signals(y_roi)
        if bad_vox.any() and VRB >= 1:
            print("WARNING: %d masked voxel(s) contain NaN/Inf signal "
                  "values; skipping them (parameter maps stay zero there)."
                  % int(bad_vox.sum()))

        configs = {}
        for i in range(ROI_size):
            if bad_vox[i]:
                continue
            key = (int(numfasc_roi[i]), bool(csf_mask_roi[i]),
                   bool(ear_mask_roi[i]))
            if key == (0, False, False):
                continue  # stays all-zero (reference mf.py:387-388)
            configs.setdefault(key, []).append(i)

        # double-float fast path: grouped-matmul rotation + compensated
        # candidate scans (run_bucket_fast). On TPU its fused df3 kernel
        # holds the full second sub-dictionary (S x N2) plus one atom tile
        # in VMEM; beyond ~1500 atoms fall back to the tiled XLA scan,
        # which streams both axes.
        aot = None
        use_fast = (engine in ("fast", "pallas")
                    or (engine == "auto" and refine
                        and jax.default_backend() == "tpu"
                        and num_seq * self.num_atom * 4 < 4 * 2 ** 20))
        fast_interpret = jax.default_backend() != "tpu"
        rotator = None

        def fast_covers(cfg):
            # 1- and 2-fascicle configs (K=1 needs a CSF block to form the
            # second scan axis); EAR additionally needs a CSF block and a
            # small enough EAR block for its per-sweep scans
            K_, csf_, ear_ = cfg
            if K_ not in (1, 2) or (K_ == 1 and not csf_):
                return False
            return not ear_ or (csf_ and self.num_ear <= 16)

        if use_fast and any(fast_covers(k) for k in configs):
            rotator = self._grouped_rotator(plan_h, pgse_scheme)
            # cold-start diet: compile every bucket's heavy programs
            # up front in the fixed order that makes their
            # persistent-cache keys reproducible across processes;
            # the returned AOT handles let the dispatch loop skip
            # each program's first-call re-trace. Under a mesh the
            # programs are lowered with the chunk loop's shardings.
            aot = fit_mod.prewarm_fast_programs(
                self.ms_interpolator, plan_h, tables[1], sig_csf,
                sig_ear, [k for k in sorted(configs)
                          if fast_covers(k)],
                batch=batch if mesh is not None else (batch_size or 512),
                rotator=rotator, health=self._kernel_health, verbose=VRB,
                mesh=mesh)

        # progress cadence contract (reference mf.py:948-949, 455-460):
        # at verbose >= 3, one line every `disp_int` voxels, at most
        # ~MAX_PROG_LINES lines total
        disp_int = int(ROI_size / min(ROI_size / MFModel.DFT_DISP_ITVL,
                                      MFModel.MAX_PROG_LINES)
                       ) if ROI_size > 0 else 1
        vox_done = 0
        # two-phase execution: dispatch every bucket's device work first
        # (async), then pull/assemble — bucket N+1's rotation and scans
        # overlap bucket N's device->host pull and any host-side
        # refinement (cross-bucket pipelining; the host->device push is
        # only hidden across buckets, not within one)
        pending = []
        for (K, has_csf, has_ear), idx_list in sorted(configs.items()):
            idx = np.asarray(idx_list)
            if VRB >= 3:
                print("Config K=%d csf=%d ear=%d: %d voxel(s)"
                      % (K, has_csf, has_ear, idx.size))
            st_bucket = time.time()
            if K == 0:
                # fascicle-free buckets (CSF and/or EAR only) are a
                # closed-form host solve — no device program at all.
                # Deferred to the pull phase so the host work (vectorized,
                # but O(ROI) for whole-brain CSF masks) does not stall
                # dispatch of the device buckets.
                pend = (lambda i_=idx, c_=has_csf, e_=has_ear:
                        fit_mod.run_bucket_trivial(
                            y_roi[i_], sig_csf, sig_ear, c_, e_))
            elif use_fast and fast_covers((K, has_csf, has_ear)):
                pend = fit_mod.run_bucket_fast(
                    self.ms_interpolator, plan_h, tables[1],
                    peaks_roi[idx, :3 * K], y_roi[idx], sig_csf,
                    K, has_csf, batch=batch if mesh is not None
                    else (batch_size or 512), topm=topm,
                    interpret=fast_interpret, rotator=rotator,
                    sig_ear=sig_ear, ear_on=has_ear, mesh=mesh,
                    defer=True, health=self._kernel_health, aot=aot)
            else:
                res_now = fit_mod.run_bucket(
                    tables, plan,
                    peaks_roi[idx, :3 * K] if K > 0
                    else np.zeros((idx.size, 0)),
                    y_roi[idx], sig_csf, sig_ear,
                    K, has_csf, has_ear, batch=batch, mesh=mesh,
                    refine=refine, ms_host=self.ms_interpolator,
                    plan_host=plan_h, topm=topm)
                pend = (lambda r=res_now: r)
            if VRB >= 2:
                print("Bucket K=%d csf=%d ear=%d (%d voxels) dispatched "
                      "in %g second(s)." % (K, has_csf, has_ear, idx.size,
                                            time.time() - st_bucket))
            pending.append(((K, has_csf, has_ear), idx, pend, st_bucket))

        if VRB >= 2:
            print("All %d bucket(s) dispatched in %g second(s)."
                  % (len(pending), time.time() - st_est))
        for (K, has_csf, has_ear), idx, pend, st_bucket in pending:
            st_pull = time.time()
            w, ind, obj, mse, r2 = pend()
            if VRB >= 2:
                print("Bucket K=%d csf=%d ear=%d (%d voxels) pulled in "
                      "%g second(s)." % (K, has_csf, has_ear, idx.size,
                                         time.time() - st_pull))
            if VRB >= 3:
                t_vox = (time.time() - st_bucket) / max(idx.size, 1)
                hits = np.arange(vox_done, vox_done + idx.size)
                for j in hits[hits % disp_int == 0]:
                    print("Voxel %d/%d (%d fasc%s%s) estimated in %g sec."
                          % (j + 1, ROI_size, K,
                             ", CSF comp" if has_csf else "",
                             ", EAR comp" if has_ear else "", t_vox))
            vox_done += idx.size
            M0 = np.sum(w, axis=1)
            nu = np.where(np.abs(M0)[:, None] > 0, w /
                          np.where(np.abs(M0)[:, None] > 0,
                                   M0[:, None], 1.0), w)
            params[idx, 0] = M0
            if K > 0:
                params[np.ix_(idx, np.arange(1, K + 1))] = nu[:, :K]
                params[np.ix_(idx, np.arange(1 + maxfasc,
                                             1 + maxfasc + K))] = ind[:, :K]
            c = K
            if has_csf:
                params[idx, i_csf] = nu[:, c]
                c += 1
            if has_ear:
                params[idx, i_ear] = nu[:, c]
                params[idx, i_ear + 1] = ind[:, c]
            params[idx, i_mse] = mse
            params[idx, i_r2] = r2

        if VRB >= 2:
            print("Estimation performed in %g second(s)."
                  % (time.time() - st_est))

        fitinfo = {"maxfasc": maxfasc,
                   "csf_on": csf_on,
                   "ear_on": ear_on,
                   "affine": nii_affine,
                   "mask": mask_arr,
                   "fasc_propnames": self._propnames(),
                   "peaks_roi": peaks_roi}
        for n in fitinfo["fasc_propnames"]:
            fitinfo["_dict_" + n] = np.asarray(self.dic[n])
        if ear_on:
            fitinfo["DIFF_ear"] = np.atleast_1d(self.dic["DIFF_ear"])
        return MFModelFit(fitinfo, params, verbose=VRB)

    def _marshal_peaks(self, peaks, colat_longit, tensors, in_mask,
                       img_shape, mask_arr, maxfasc, ROI_size, VRB):
        """Build the (ROI_size, 3*maxfasc) peaks array from any of the three
        orientation input styles (reference mf.py:693-800)."""
        nii_affine = None
        if peaks is not None:
            if isinstance(peaks, (str, os.PathLike)):
                img = nifti.load(peaks)
                peaks_vol = img.get_fdata()
                nii_affine = img.affine
            else:
                peaks_vol = np.asarray(peaks)
            pk_sh = peaks_vol.shape
            if pk_sh[:-1] != img_shape:
                raise ValueError("Arg. peaks not compatible. Based on data,"
                                 " it should have shape (%s x), with x a "
                                 "multiple of 3. Got (%s) instead." %
                                 (" ".join("%d" % x for x in img_shape),
                                  " ".join("%d" % x for x in pk_sh)))
            if pk_sh[-1] % 3 != 0:
                raise ValueError("Size of last dimension of arg. peaks"
                                 " should be a multiple of 3, got %d"
                                 " instead." % pk_sh[-1])
            if pk_sh[-1] > maxfasc * 3 and VRB >= 1:
                print("Ignoring last %d value(s) along last dimension of"
                      " peaks, as max number of axon populations in mask"
                      " is %d." % (pk_sh[-1] - maxfasc * 3, maxfasc))
            return peaks_vol[in_mask][:, :3 * maxfasc], nii_affine

        if colat_longit is not None:
            peak_arg = colat_longit
            datadim = ((2,),)
        elif tensors is not None:
            peak_arg = tensors
            datadim = ((6,), (1, 6))
        else:
            raise RuntimeError("At least one of peaks, colat_longit and"
                               " tensors must be specified.")

        if not isinstance(peak_arg, list):
            peak_arg = [peak_arg]
        peaks_roi = np.zeros((ROI_size, 3 * max(len(peak_arg), maxfasc)))
        if len(peak_arg) > maxfasc and VRB >= 1:
            print("Ignoring %d peak orientation argument(s) because"
                  " max number of axon populations in mask is %d." %
                  (len(peak_arg) - maxfasc, maxfasc))
        for i in range(min(len(peak_arg), maxfasc)):
            if isinstance(peak_arg[i], (str, os.PathLike)):
                img = nifti.load(peak_arg[i])
                arg_i = img.get_fdata()
                if nii_affine is None:
                    nii_affine = img.affine
            else:
                arg_i = np.asarray(peak_arg[i])
            sh_i = arg_i.shape
            if sh_i not in [img_shape + d for d in datadim]:
                dims = " or ".join(
                    "(" + " ".join("%d" % x for x in img_shape + d) + ")"
                    for d in datadim)
                raise ValueError("Peak orientation arg. %d of %d seems "
                                 "incompatible. Based on data, it should"
                                 " have shape %s, got (%s) instead." %
                                 (i + 1, len(peak_arg), dims,
                                  " ".join("%d" % x for x in sh_i)))
            if colat_longit is not None:
                th = arg_i[in_mask][:, 0]
                ph = arg_i[in_mask][:, 1]
                peaks_roi[:, 3 * i + 0] = np.sin(th) * np.cos(ph)
                peaks_roi[:, 3 * i + 1] = np.sin(th) * np.sin(ph)
                peaks_roi[:, 3 * i + 2] = np.cos(th)
            else:
                if sh_i[mask_arr.ndim] == 1:  # (..., 1, 6)
                    idx = ((slice(None),) * mask_arr.ndim
                           + (0,) + (slice(None),))
                    arg_i = arg_i[idx]
                peaks_roi[:, 3 * i:3 * i + 3] = dti.principal_eigenvectors(
                    dti.DT_vec_to_2Darray(arg_i[in_mask], order="column"))
        return peaks_roi[:, :3 * maxfasc], nii_affine

    @staticmethod
    def _marshal_flag_mask(flag_mask, name, in_mask, img_shape, ROI_size):
        """Scalar / path / volume -> (ROI_size,) bool (reference
        mf.py:852-894)."""
        nii_affine = None
        if flag_mask is None:
            return np.zeros(ROI_size, dtype=bool), None
        if np.isscalar(flag_mask) and not isinstance(flag_mask, str):
            return np.full(ROI_size, flag_mask > 0, dtype=bool), None
        if isinstance(flag_mask, (str, os.PathLike)):
            img = nifti.load(flag_mask)
            flag_mask = img.get_fdata()
            nii_affine = img.affine
        flag_mask = np.asarray(flag_mask)
        if flag_mask.shape != img_shape:
            raise ValueError("Arg. %s incompatible. Based on data,"
                             " it should have shape (%s), detected (%s)"
                             " instead." %
                             (name,
                              " ".join("%d" % x for x in img_shape),
                              " ".join("%d" % x for x in flag_mask.shape)))
        return (flag_mask[in_mask] > 0), nii_affine


class MFModelFit(object):
    """Fit object: one property map per estimated parameter (reference
    mf.py:1054-1175)."""

    def __init__(self, fitinfo, model_params, verbose=0):
        self.affine = fitinfo["affine"]
        numfasc = fitinfo["maxfasc"]
        csf_on = fitinfo["csf_on"]
        ear_on = fitinfo["ear_on"]
        mask = fitinfo["mask"]
        in_mask = mask > 0
        ROI_size = model_params.shape[0]
        assert ROI_size == np.sum(in_mask), ('Inconsistent mask and model '
                                             'parameter array')

        self.M0 = np.zeros(mask.shape)
        self.M0[in_mask] = model_params[:, 0]
        parlist = ['M0']

        for k in range(numfasc):
            nu_k = model_params[:, k + 1]
            prop_map = np.zeros(mask.shape)
            prop_map[in_mask] = nu_k
            setattr(self, 'frac_f%d' % k, prop_map)
            parlist.append('frac_f%d' % k)

            p_k = fitinfo['peaks_roi'][:, 3 * k:3 * (k + 1)]
            prop_map = np.zeros(mask.shape + (3,))
            prop_map[in_mask] = p_k
            setattr(self, 'peak_f%d' % k, prop_map)
            parlist.append('peak_f%d' % k)

        # fascicle-specific property maps + nu-weighted voxel totals
        for propname in fitinfo['fasc_propnames']:
            prop_tot_in_mask = np.zeros(ROI_size)
            for k in range(numfasc):
                nu_k = model_params[:, k + 1]
                ID_k = model_params[:, 1 + numfasc + k].astype(int)
                prop_k = fitinfo['_dict_' + propname][ID_k] * (nu_k > 0)
                prop_tot_in_mask += nu_k * prop_k
                prop_map = np.zeros(mask.shape)
                prop_map[in_mask] = prop_k
                setattr(self, propname + '_f%d' % k, prop_map)
                parlist.append(propname + '_f%d' % k)
            prop_map = np.zeros(mask.shape)
            prop_map[in_mask] = prop_tot_in_mask
            setattr(self, propname + '_tot', prop_map)
            parlist.append(propname + '_tot')

        if csf_on:
            self.frac_csf = np.zeros(mask.shape)
            self.frac_csf[in_mask] = model_params[:, 2 * numfasc + 1]
            parlist.append('frac_csf')
        if ear_on:
            self.frac_ear = np.zeros(mask.shape)
            nu_ear = model_params[:, 2 * numfasc + csf_on + 1]
            self.frac_ear[in_mask] = nu_ear
            parlist.append('frac_ear')
            ID_ear = model_params[:, 2 * numfasc + csf_on + 2].astype(int)
            self.D_ear = np.zeros(mask.shape)
            self.D_ear[in_mask] = fitinfo['DIFF_ear'][ID_ear] * (nu_ear > 0)
            parlist.append('D_ear')

        self.MSE = np.zeros(mask.shape)
        self.MSE[in_mask] = model_params[:, -2]
        parlist.append('MSE')
        self.R2 = np.zeros(mask.shape)
        self.R2[in_mask] = model_params[:, -1]
        parlist.append('R2')

        self.param_names = parlist
        if verbose >= 2:
            print("Microstructure Fingerprinting fit object constructed.")
            print("Parameter maps (access as attributes, export with"
                  " write_nifti):")
            for p in parlist:
                print('\t%s' % (p,))

    def write_nifti(self, output_basename, affine=None):
        """Export one NIfTI per parameter map as {base}_{param}{.nii|.nii.gz}
        (reference mf.py:1177-1229). Returns the list of files written."""
        if affine is None:
            affine = self.affine
        if affine is None:
            raise ValueError(
                "Argument affine must be explicitely passed  because "
                "no affine transform matrix was found during model "
                "fitting. Expecting NumPy array with shape (4, 4).")
        niigz = '.nii.gz'
        if (len(output_basename) > len(niigz)
                and output_basename[-len(niigz):] == niigz):
            (path, fname) = os.path.split(output_basename[:-len(niigz)])
            ext = niigz
        else:
            (path, tail) = os.path.split(output_basename)
            (fname, ext) = os.path.splitext(tail)
            if ext not in ['', '.nii']:
                raise ValueError("Unknown NIfTI extension %s in output %s" %
                                 (ext, output_basename))
            ext = '.nii'
        basename = os.path.join(path, fname)
        fnames = []
        for p in self.param_names:
            nii = nifti.Nifti1Image(getattr(self, p), affine)
            nii_fname = '%s_%s%s' % (basename, p, ext)
            nifti.save(nii, nii_fname)
            fnames.append(nii_fname)
        return fnames
