"""Config-driven ICP chain construction — the module-registry analogue.

TPU-native replacement for libpointmatcher's name->factory Registrar and
YAML chain loading (reference: pointmatcher/Registrar.h, Registry.cpp:59-131,
ICP.cpp:113-160 ``ICPChainBase::loadFromYaml``), plus the standalone filter
pipeline runner (reference: pointmatcher_ros/include/pointmatcher_ros/
PointMatcherFilterInterface.h:12-22).

A chain file uses the same structure (and module names) as the reference's
``icp.yaml`` (ros/open3d_slam_ros/param/icp.yaml):

    readingDataPointsFilters:
      - RandomSamplingDataPointsFilter:
          prob: 0.5
    referenceDataPointsFilters:
      - SurfaceNormalDataPointsFilter:
          knn: 10
    matcher:
      KDTreeMatcher:
        knn: 1
        maxDist: 0.5
    outlierFilters:
      - TrimmedDistOutlierFilter:
          ratio: 0.90
    errorMinimizer:
      PointToPlaneErrorMinimizer
    transformationCheckers:
      - CounterTransformationChecker:
          maxIterationCount: 15
      - DifferentialTransformationChecker:
          minDiffRotErr: 0.001
          minDiffTransErr: 0.01
          smoothLength: 3

so a user of the reference can bring their tuned chain config unchanged.
Instead of virtual-dispatch module objects, loading produces (a) two jit-able
filter pipelines and (b) a static :class:`ICPConfig` that selects compiled
branches inside the single fused :func:`icp.register` program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ...utils.pointcloud import PointCloud
from .. import filters, filters_extra, hashgrid, normals
from . import loggers, parametrizable
from .icp import ICPConfig

Array = jax.Array


def _canon(name: str) -> str:
    """Canonicalize a libpointmatcher registry name: strip the class suffix,
    lower-case (``RandomSamplingDataPointsFilter`` -> ``randomsampling``)."""
    for suffix in ("DataPointsFilter", "OutlierFilter", "ErrorMinimizer",
                   "TransformationChecker", "Matcher", "Inspector", "Logger"):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
            break
    return name.strip().lower()


def _entries(section) -> List[Tuple[str, Dict[str, Any]]]:
    """Normalize a YAML section into [(name, params)].

    Accepts a list of {Name: {params}} / bare names, or a single mapping /
    bare name (the errorMinimizer / matcher sections).
    """
    if section is None:
        return []
    out: List[Tuple[str, Dict[str, Any]]] = []
    items = section if isinstance(section, list) else [section]
    for item in items:
        if isinstance(item, str):
            out.append((item, {}))
        elif isinstance(item, dict):
            for k, v in item.items():
                out.append((k, dict(v) if isinstance(v, dict) else {}))
        else:
            raise ValueError(f"unparseable chain entry: {item!r}")
    return out


# --------------------------------------------------------------------------
# DataPointsFilter registry: canonical name -> fn(cloud, key, params) -> cloud
# Parameter names follow the libpointmatcher modules they mirror
# (reference: pointmatcher/DataPointsFilters/*.cpp declareParameter docs).
# --------------------------------------------------------------------------

def _f_identity(cloud, key, p):
    return cloud


def _f_remove_nan(cloud, key, p):
    return filters.remove_non_finite(cloud)


def _f_max_dist(cloud, key, p):
    return filters.distance_limit(cloud, max_dist=float(p.get("maxDist", 1.0)))


def _f_min_dist(cloud, key, p):
    return filters.distance_limit(cloud, min_dist=float(p.get("minDist", 1.0)))


def _f_distance_limit(cloud, key, p):
    # dim: 0/1/2 = axis threshold, -1 = radial (reference DistanceLimit).
    dim = int(p.get("dim", -1))
    dist = float(p.get("dist", 1.0))
    remove_inside = int(p.get("removeInside", 0))
    if dim < 0:
        if remove_inside:
            return filters.distance_limit(cloud, min_dist=dist)
        return filters.distance_limit(cloud, max_dist=dist)
    lo = [-jnp.inf] * 3
    hi = [jnp.inf] * 3
    lo[dim], hi[dim] = -dist, dist
    return filters.bounding_box(cloud, jnp.asarray(lo), jnp.asarray(hi),
                                invert=bool(remove_inside))


def _f_bounding_box(cloud, key, p):
    lo = jnp.asarray([float(p.get("xMin", -1.0)), float(p.get("yMin", -1.0)),
                      float(p.get("zMin", -1.0))])
    hi = jnp.asarray([float(p.get("xMax", 1.0)), float(p.get("yMax", 1.0)),
                      float(p.get("zMax", 1.0))])
    return filters.bounding_box(cloud, lo, hi,
                                invert=bool(int(p.get("removeInside", 1))))


def _f_max_quantile(cloud, key, p):
    return filters_extra.max_quantile_on_axis(
        cloud, ratio=float(p.get("ratio", 0.5)), axis=int(p.get("dim", 0)))


def _f_max_density(cloud, key, p):
    return filters_extra.max_density(
        cloud, key, max_density_pts_per_m3=float(p.get("maxDensity", 10.0)))


def _f_surface_normal(cloud, key, p):
    return normals.estimate_normals(
        cloud, radius=float(p.get("radius", 1.0)), k=int(p.get("knn", 10)))


def _f_sampling_surface_normal(cloud, key, p):
    return filters_extra.sampling_surface_normal(
        cloud, key, ratio=float(p.get("ratio", 0.5)), knn=int(p.get("knn", 7)))


def _f_elipsoids(cloud, key, p):
    return filters_extra.elipsoids(
        cloud, key,
        ratio=float(p.get("ratio", 0.5)),
        knn=int(p.get("knn", 7)),
        sampling_method=int(p.get("samplingMethod", 0)),
        max_box_dim=float(p.get("maxBoxDim", jnp.inf)),
        min_planarity=float(p.get("minPlanarity", 0.0)),
        keep_normals=bool(int(p.get("keepNormals", 1))),
        keep_densities=bool(int(p.get("keepDensities", 0))),
        keep_eigen_values=bool(int(p.get("keepEigenValues", 0))),
        keep_eigen_vectors=bool(int(p.get("keepEigenVectors", 0))),
        keep_covariances=bool(int(p.get("keepCovariances", 0))),
        keep_weights=bool(int(p.get("keepWeights", 0))),
        keep_means=bool(int(p.get("keepMeans", 0))),
        keep_shapes=bool(int(p.get("keepShapes", 0))),
        average_existing_descriptors=bool(
            int(p.get("averageExistingDescriptors", 1))))


def _f_gestalt(cloud, key, p):
    return filters_extra.gestalt(
        cloud, key,
        ratio=float(p.get("ratio", 0.1)),
        radius=float(p.get("radius", 5.0)),
        knn=int(p.get("knn", 7)),
        vsize=(float(p.get("vSizeX", 1.0)), float(p.get("vSizeY", 1.0)),
               float(p.get("vSizeZ", 1.0))),
        keep_normals=bool(int(p.get("keepNormals", 1))),
        keep_means=bool(int(p.get("keepMeans", 0))),
        keep_eigen_values=bool(int(p.get("keepEigenValues", 0))),
        keep_eigen_vectors=bool(int(p.get("keepEigenVectors", 0))),
        keep_covariances=bool(int(p.get("keepCovariances", 0))),
        keep_gestalt_features=bool(int(p.get("keepGestaltFeatures", 1))),
        average_existing_descriptors=bool(
            int(p.get("averageExistingDescriptors", 1))))


def _f_orient_normals(cloud, key, p):
    return filters_extra.orient_normals(
        cloud, toward_sensor=bool(int(p.get("towardCenter", 1))))


def _f_observation_direction(cloud, key, p):
    # Records the sensor->point direction descriptor (reference
    # ObservationDirectionDataPointsFilter).  Consumed by OrientNormals;
    # normal orientation is sign-only and cancels in the point-to-plane
    # normal equations ((-n)(-r) = n r), so cloud geometry is unchanged.
    return filters_extra.with_observation_direction(
        cloud, sensor=(float(p.get("x", 0.0)), float(p.get("y", 0.0)),
                       float(p.get("z", 0.0))))


def _f_incidence_angle(cloud, key, p):
    return filters_extra.with_incidence_angle(cloud)


def _f_random_sampling(cloud, key, p):
    return filters.random_sampling(cloud, key, prob=float(p.get("prob", 0.75)))


def _f_max_point_count(cloud, key, p):
    return filters.max_point_count(cloud, key, int(p.get("maxCount", 1000000)))


def _f_fix_step(cloud, key, p):
    return filters_extra.fix_step_sampling(cloud, step=int(p.get("startStep", 10)))


def _f_shadow(cloud, key, p):
    return filters_extra.shadow_filter(cloud, eps=float(p.get("eps", 0.1)))


def _f_sensor_noise(cloud, key, p):
    # sensorType codes (reference SimpleSensorNoise.cpp): 0=LMS, 1=HDL, ...
    st = p.get("sensorType", "lms")
    st = {0: "lms", 1: "hdl"}.get(int(st), "other") if str(st).isdigit() else str(st)
    return filters_extra.with_simple_sensor_noise(
        cloud, sensor_type=st, gain=float(p.get("gain", 1.0)))


def _f_voxel_grid(cloud, key, p):
    v = float(p.get("vSizeX", 0.2))
    return filters.voxel_downsample(cloud, v, capacity=cloud.capacity)


def _f_normal_space(cloud, key, p):
    return filters_extra.normal_space_sampling(
        cloud, key, target=int(p.get("nbSample", 5000)))


def _f_covariance_sampling(cloud, key, p):
    return filters_extra.covariance_sampling(cloud, target=int(p.get("nbSample", 5000)))


def _f_octree_grid(cloud, key, p):
    return filters_extra.octree_grid(
        cloud, max_size_by_node=float(p.get("maxSizeByNode", 0.2)),
        sample_mode=int(p.get("samplingMethod", 0)))


def _f_hidden_point_removal(cloud, key, p):
    return filters_extra.hidden_point_removal(
        cloud, radius_scale=float(p.get("radius", 100.0)))


def _f_cut_at_descriptor(cloud, key, p):
    return filters_extra.cut_at_descriptor_threshold(
        cloud, descriptor=str(p.get("descName", "incidenceAngles")),
        threshold=float(p.get("threshold", 0.5)),
        use_larger_than=bool(int(p.get("useLargerThan", 1))))


def _f_remove_sensor_bias(cloud, key, p):
    return filters_extra.remove_sensor_bias(cloud, angle_threshold=float(
        p.get("angleThreshold", 0.785)))


def _f_organized_surface_normal(cloud, key, p):
    # The reference reads the image shape off the DataPoints' IndexGrid;
    # fixed-shape clouds carry none, so the chain config must provide it
    # ("rows"/"cols" — sensor-specific, e.g. 16x1800 for an RS16).
    if "rows" not in p or "cols" not in p:
        raise ValueError(
            "OrganizedCloudSurfaceNormalDataPointsFilter needs explicit "
            "'rows' and 'cols' (the range-image shape; the reference reads "
            "them from DataPoints::IndexGrid which fixed-shape clouds lack)")
    return normals.organized_surface_normals(
        cloud, rows=int(p["rows"]), cols=int(p["cols"]),
        knn=int(p.get("knn", 5)),
        max_dist=float(p.get("maxDist", float("inf"))))


_FILTERS = {
    "identity": _f_identity,
    "removenan": _f_remove_nan,
    "maxdist": _f_max_dist,
    "mindist": _f_min_dist,
    "distancelimit": _f_distance_limit,
    "boundingbox": _f_bounding_box,
    "maxquantileonaxis": _f_max_quantile,
    "maxdensity": _f_max_density,
    "surfacenormal": _f_surface_normal,
    "samplingsurfacenormal": _f_sampling_surface_normal,
    "orientnormals": _f_orient_normals,
    "observationdirection": _f_observation_direction,
    "incidenceangle": _f_incidence_angle,
    "randomsampling": _f_random_sampling,
    "maxpointcount": _f_max_point_count,
    "fixstepsampling": _f_fix_step,
    "shadow": _f_shadow,
    "simplesensornoise": _f_sensor_noise,
    "voxelgrid": _f_voxel_grid,
    "normalspace": _f_normal_space,
    "covariancesampling": _f_covariance_sampling,
    "octreegrid": _f_octree_grid,
    "hiddenpointremoval": _f_hidden_point_removal,
    "cutatdescriptorthreshold": _f_cut_at_descriptor,
    "removesensorbias": _f_remove_sensor_bias,
    "organizedcloudsurfacenormal": _f_organized_surface_normal,
    "elipsoids": _f_elipsoids,
    "gestalt": _f_gestalt,
}

# No excluded registry entries remain: all 28 reference DataPointsFilters
# (Registry.cpp:67-95) are registered.
_EXCLUDED_FILTERS = {}


class FilterPipeline:
    """An ordered DataPointsFilter pipeline applied to fixed-capacity clouds.

    ≙ applying ``readingDataPointsFilters``/``referenceDataPointsFilters``
    in sequence (reference ICP.cpp:340-345, 300-303) and the standalone
    PointMatcherFilterInterface::process.  Stateless and jit-able: the
    pipeline itself is static config; randomized filters consume the key.
    """

    def __init__(self, specs: Sequence[Tuple[str, Dict[str, Any]]]):
        self.specs = []
        for raw_name, params in specs:
            name = _canon(raw_name)
            if name in _EXCLUDED_FILTERS:
                raise ValueError(
                    f"DataPointsFilter {raw_name!r} is intentionally "
                    f"unsupported: {_EXCLUDED_FILTERS[name]}")
            if name not in _FILTERS:
                raise ValueError(
                    f"unknown DataPointsFilter {raw_name!r} (canonical {name!r}); "
                    f"known: {sorted(_FILTERS)}")
            # Per-parameter bounds (≙ Parametrizable.cpp InvalidParameter).
            parametrizable.validate("dataPointsFilter", name, params)
            self.specs.append((name, dict(params)))

    def __call__(self, cloud: PointCloud, key: Optional[Array] = None) -> PointCloud:
        if key is None:
            key = jax.random.PRNGKey(0)
        for i, (name, params) in enumerate(self.specs):
            sub = jax.random.fold_in(key, i)
            cloud = _FILTERS[name](cloud, sub, params)
        return cloud


# --------------------------------------------------------------------------
# Chain assembly
# --------------------------------------------------------------------------

_OUTLIER_MAP = {
    # canonical libpointmatcher name -> (our name, param extraction)
    "null": lambda p: ("null",),
    "trimmeddist": lambda p: ("trimmed", float(p.get("ratio", 0.85))),
    "vartrimmeddist": lambda p: ("var_trimmed", float(p.get("minRatio", 0.05)),
                                 float(p.get("maxRatio", 0.99)),
                                 float(p.get("lambda", 2.35))),
    "mediandist": lambda p: ("median", float(p.get("factor", 3.0))),
    "maxdist": lambda p: ("max_dist", float(p.get("maxDist", 1.0))),
    "mindist": lambda p: ("min_dist", float(p.get("minDist", 0.1))),
    "surfacenormal": lambda p: ("surface_normal", float(p.get("maxAngle", 1.57))),
    # (fct, tuning, scaleEstimator, distanceType, approximation) — the
    # RobustOutlierFilter parameter set (reference OutlierFiltersImpl.cpp:
    # 390-436).
    "robust": lambda p: ("robust", str(p.get("robustFct", "cauchy")),
                         float(p.get("tuning", 1.0)),
                         str(p.get("scaleEstimator", "none")),
                         str(p.get("distanceType", "point2point")),
                         float(p.get("approximation", float("inf")))),
    # (soft, larger, threshold); descName handled separately — the chain
    # builds the reference grid with that channel (reference
    # OutlierFiltersImpl.h:196-221; the upstream code reads the REFERENCE
    # cloud's descriptor for either 'source' setting).
    "genericdescriptor": lambda p: ("generic_desc",
                                    bool(int(p.get("useSoftThreshold", 0))),
                                    bool(int(p.get("useLargerThan", 1))),
                                    float(p.get("threshold", 0.1))),
}

_MINIMIZER_MAP = {
    "identity": ("identity", False),
    "pointtopoint": ("point_to_point", False),
    "pointtopointsimilarity": ("similarity", False),
    "pointtoplane": ("point_to_plane", False),
    "pointtopointwithcov": ("point_to_point", True),
    "pointtoplanewithcov": ("point_to_plane", True),
}


@dataclasses.dataclass
class IcpChain:
    """A fully-assembled registration chain (≙ configured PM::ICP object).

    reading/reference filter pipelines + static ICPConfig; ``with_covariance``
    marks a *WithCov minimizer (covariance of the solution is then returned
    by :meth:`register`).
    """

    reading_filters: FilterPipeline
    reference_filters: FilterPipeline
    config: ICPConfig
    with_covariance: bool = False
    sensor_std: float = 0.01
    # Reference descriptor channel consumed by GenericDescriptorOutlierFilter
    # (the grid is built carrying this channel).
    ref_desc_channel: str = None
    # Chain logger (≙ the yaml `logger` section, Registry.cpp:126-127).
    logger: "loggers.Logger" = dataclasses.field(
        default_factory=lambda: loggers.NullLogger())

    def process_reading(self, cloud: PointCloud, key=None) -> PointCloud:
        return self.reading_filters(cloud, key)

    def process_reference(self, cloud: PointCloud, key=None) -> PointCloud:
        return self.reference_filters(cloud, key)

    def register(self, source: PointCloud, reference: Union[PointCloud, "hashgrid.HashGrid"],
                 init_T: Array, key=None, table_size: int = 1 << 14):
        """Filter both clouds, build the reference grid, run the compiled ICP.

        ≙ PM::ICP::operator()(reading, reference, initial) — ICP.cpp:231-256.
        Pass a prebuilt HashGrid as ``reference`` to amortize reference prep
        across calls (≙ ICPSequence/initReference).
        """
        from . import icp as icp_mod

        if key is None:
            key = jax.random.PRNGKey(0)
        k_read, k_ref = jax.random.split(key)
        src = self.process_reading(source, k_read)
        if isinstance(reference, PointCloud):
            ref = self.process_reference(reference, k_ref)
            if self.config.matcher in ("bruteforce", "pallas") or not jnp.isfinite(
                    self.config.max_correspondence_dist):
                # Dense matchers only read points/normals; no CSR index (and
                # maxDist=inf, the KDTreeMatcher default, has no voxel size).
                grid = hashgrid.passthrough(ref, 1.0,
                                            desc_channel=self.ref_desc_channel)
            else:
                grid = hashgrid.build(ref, self.config.max_correspondence_dist,
                                      table_size=table_size,
                                      desc_channel=self.ref_desc_channel)
        else:
            grid = reference
        if self.with_covariance:
            res = icp_mod.register_with_covariance(src, grid, init_T, self.config,
                                                   sensor_std=self.sensor_std)
        else:
            res = icp_mod.register(src, grid, init_T, self.config)
        if self.logger.has_info:
            # Per-call summary (the fused while-loop ICP cannot call host
            # code per iteration; see loggers.py module docstring).
            import numpy as _np

            r = res[0] if isinstance(res, tuple) else res
            t = _np.asarray(r.transform)[:3, 3]
            self.logger.info(
                f"PointMatcher::icp - reading {int(src.count())} pts, "
                f"{int(r.iterations)} iterations, match ratio "
                f"{float(r.match_ratio):.4f}, translation "
                f"[{t[0]:.4f} {t[1]:.4f} {t[2]:.4f}]")
        return res


def from_dict(chain: Dict[str, Any], matcher_impl: str = "bruteforce") -> IcpChain:
    """Assemble an :class:`IcpChain` from a parsed chain dict.

    ≙ ICPChainBase::loadFromYaml (reference ICP.cpp:113-160): walks the
    known sections, resolves each module by registry name, validates
    unknown sections exactly like usedModuleTypes checking.
    """
    known = {"readingDataPointsFilters", "readingStepDataPointsFilters",
             "referenceDataPointsFilters", "matcher", "outlierFilters",
             "errorMinimizer", "transformationCheckers", "inspector",
             "logger"}
    unknown = set(chain) - known
    if unknown:
        raise ValueError(f"unknown ICP chain sections: {sorted(unknown)}")

    reading = FilterPipeline(_entries(chain.get("readingDataPointsFilters")))
    reference = FilterPipeline(_entries(chain.get("referenceDataPointsFilters")))

    cfg_kw: Dict[str, Any] = {"matcher": matcher_impl}

    # matcher ---------------------------------------------------------------
    m = _entries(chain.get("matcher"))
    if m:
        name, params = m[0]
        cname = _canon(name)
        if cname not in ("kdtree", "kdtreevardist", "null", "bruteforce"):
            raise ValueError(f"unknown matcher {name!r}")
        parametrizable.validate("matcher", cname, params)
        # KDTreeMatcher defaults (reference MatchersImpl.h): knn=1,
        # maxDist=inf.  knn>1 stacks all k matches as correspondences.
        # epsilon (approximate search) has no analogue in exact gather —
        # exact search is a strict quality upgrade.
        cfg_kw["max_correspondence_dist"] = float(params.get("maxDist", float("inf")))
        cfg_kw["knn"] = int(params.get("knn", 1))
        if cname == "kdtreevardist":
            # Per-reading-point search radius from a descriptor channel
            # (reference KDTreeVarDistMatcher, MatchersImpl.h:119-148 —
            # libnabo maxRadii from the ``maxDistField`` descriptor,
            # default "maxSearchDist").  The gate applies after the NN
            # gather (icp._vardist_gate); registration fails fast at trace
            # time if the reading cloud lacks the channel.
            cfg_kw["max_dist_field"] = str(params.get("maxDistField",
                                                      "maxSearchDist"))

    # outlier filters ---------------------------------------------------------
    ref_desc_channel = None
    ofs = _entries(chain.get("outlierFilters"))
    if ofs:
        entries = []
        for name, params in ofs:
            cname = _canon(name)
            if cname not in _OUTLIER_MAP:
                raise ValueError(f"unknown outlier filter {name!r}; "
                                 f"known: {sorted(_OUTLIER_MAP)}")
            parametrizable.validate("outlierFilter", cname, params)
            if cname == "genericdescriptor":
                ref_desc_channel = str(params.get("descName", "none"))
            entries.append(_OUTLIER_MAP[cname](params))
        cfg_kw["outlier_chain"] = tuple(entries)

    # error minimizer ---------------------------------------------------------
    with_cov = False
    sensor_std = 0.01
    em = _entries(chain.get("errorMinimizer"))
    if em:
        name, params = em[0]
        cname = _canon(name)
        if cname not in _MINIMIZER_MAP:
            raise ValueError(f"unknown error minimizer {name!r}; "
                             f"known: {sorted(_MINIMIZER_MAP)}")
        cfg_kw["minimizer"], with_cov = _MINIMIZER_MAP[cname]
        sensor_std = float(params.get("sensorStdDev", 0.01))
        # PointToPlane DOF restrictions (reference PointToPlane.cpp:87-106).
        if int(params.get("force4DOF", 0)):
            cfg_kw["force4dof"] = True
        if int(params.get("force2D", 0)):
            cfg_kw["force2d"] = True

    # transformation checkers -------------------------------------------------
    for name, params in _entries(chain.get("transformationCheckers")):
        cname = _canon(name)
        parametrizable.validate("transformationChecker", cname, params)
        if cname == "counter":
            cfg_kw["max_iterations"] = int(params.get("maxIterationCount", 40))
        elif cname == "differential":
            cfg_kw["min_diff_rot"] = float(params.get("minDiffRotErr", 0.001))
            cfg_kw["min_diff_trans"] = float(params.get("minDiffTransErr", 0.001))
            cfg_kw["smooth_length"] = int(params.get("smoothLength", 3))
        elif cname == "bound":
            cfg_kw["bound_max_rot"] = float(params.get("maxRotationNorm", 1.0))
            cfg_kw["bound_max_trans"] = float(params.get("maxTranslationNorm", 1.0))
        else:
            raise ValueError(f"unknown transformation checker {name!r}")

    # logger ------------------------------------------------------------------
    # (≙ Registry.cpp:126-127; inspector stays config-compatible — per-
    # iteration dumps run through inspectors.py / utils.timing.)
    logger = loggers.NullLogger()
    lg = _entries(chain.get("logger"))
    if lg:
        lname, lparams = lg[0]
        logger = loggers.make_logger(lname, lparams)

    return IcpChain(reading_filters=reading, reference_filters=reference,
                    config=ICPConfig(**cfg_kw), with_covariance=with_cov,
                    sensor_std=sensor_std, ref_desc_channel=ref_desc_channel,
                    logger=logger)


def from_yaml(path: str, matcher_impl: str = "bruteforce") -> IcpChain:
    """Load an icp.yaml-style chain file (same schema as the reference's
    ros/open3d_slam_ros/param/icp.yaml)."""
    import yaml

    with open(path) as f:
        chain = yaml.safe_load(f)
    return from_dict(chain or {}, matcher_impl=matcher_impl)


def filter_pipeline_from_yaml(path: str) -> FilterPipeline:
    """Standalone filter pipeline from a YAML list of DataPointsFilters
    (≙ PointMatcherFilterInterface::readPipelineFile)."""
    import yaml

    with open(path) as f:
        section = yaml.safe_load(f)
    return FilterPipeline(_entries(section))
