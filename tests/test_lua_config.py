"""Lua parameter loading (≙ reference lua_parameter_dictionary_test.cc /
configuration_files_test.cc and LuaLoader key-consumption verification)."""
import os
import textwrap

import pytest

from open3d_slam_advanced_rss_2024_public_tpu.utils.lua_config import (
    evaluate_lua_file, load_lua_parameters)

REF_PARAM_DIR = "/root/reference/open3d_slam_rsl/ros/open3d_slam_ros/param"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_table_literals_and_types(tmp_path):
    f = _write(tmp_path, "a.lua", """
        T = {
          num = 1.5,
          int = 7,
          neg = -50.0,
          flag = true, -- trailing comment
          off = false,
          name = "hello world", -- strings
          nested = { x = 1, y = { z = 2 } },
        }
        return T
    """)
    t = evaluate_lua_file(f)
    assert t["num"] == 1.5 and isinstance(t["int"], int) and t["int"] == 7
    assert t["neg"] == -50.0
    assert t["flag"] is True and t["off"] is False
    assert t["name"] == "hello world"
    assert t["nested"]["y"]["z"] == 2


def test_include_deepcopy_and_dotted_assignment(tmp_path):
    _write(tmp_path, "base.lua", """
        -- a deepcopy definition like the reference schema file; body is skipped
        function deepcopy(orig, copies)
            copies = copies or {}
            if type(orig) == 'table' then
                for k, v in next, orig, nil do end
            end
            return copy
        end
        BLOCK = { a = 1, sub = { b = 2 } }
        DEFAULTS = { first = deepcopy(BLOCK), second = deepcopy(BLOCK) }
    """)
    f = _write(tmp_path, "top.lua", """
        include "base.lua"
        params = deepcopy(DEFAULTS)
        params.first.sub.b = 42
        params.created.path = "new"
        return params
    """)
    t = evaluate_lua_file(f)
    # deepcopy isolation: mutating first must not touch second
    assert t["first"]["sub"]["b"] == 42
    assert t["second"]["sub"]["b"] == 2
    assert t["created"]["path"] == "new"


def test_search_dir_resolution(tmp_path):
    incdir = tmp_path / "inc"
    incdir.mkdir()
    (incdir / "shared.lua").write_text("SHARED = { v = 9 }\n")
    f = _write(tmp_path, "uses.lua", """
        include "shared.lua"
        return SHARED
    """)
    t = evaluate_lua_file(f, search_dirs=[str(incdir)])
    assert t["v"] == 9


def test_missing_include_raises(tmp_path):
    f = _write(tmp_path, "bad.lua", 'include "nope.lua"\nreturn {}')
    with pytest.raises(FileNotFoundError):
        evaluate_lua_file(f)


def test_undefined_variable_raises(tmp_path):
    f = _write(tmp_path, "bad.lua", "x = NOT_DEFINED\nreturn {}")
    with pytest.raises(NameError):
        evaluate_lua_file(f)


def test_unused_keys_warn_and_strict_raises(tmp_path):
    _write(tmp_path, "defaults.lua", "DEFAULT_PARAMETERS = { odometry = {} }\n")
    f = _write(tmp_path, "cfg.lua", """
        include "defaults.lua"
        params = deepcopy(DEFAULT_PARAMETERS)
        params.odometry.is_publish_odometry_msgs = true
        params.bogus_block = 1
        return params
    """)
    params, warnings = load_lua_parameters(f)
    assert params.odometry.is_publish_odometry_msgs is True
    assert any("bogus_block" in w for w in warnings)
    with pytest.raises(KeyError):
        load_lua_parameters(f, strict=True)


def test_unknown_nested_key_raises(tmp_path):
    f = _write(tmp_path, "cfg.lua", """
        params = { odometry = { not_a_real_key = 1 } }
        return params
    """)
    with pytest.raises(KeyError):
        load_lua_parameters(f)


@pytest.mark.skipif(not os.path.isdir(REF_PARAM_DIR),
                    reason="reference checkout not available")
def test_reference_param_files_load_without_warnings():
    import glob

    files = sorted(glob.glob(REF_PARAM_DIR + "/*.lua"))
    assert files
    for f in files:
        params, warnings = load_lua_parameters(f, search_dirs=[REF_PARAM_DIR])
        assert warnings == [], (f, warnings)


@pytest.mark.skipif(not os.path.isdir(REF_PARAM_DIR),
                    reason="reference checkout not available")
def test_reference_rs16_values():
    f = REF_PARAM_DIR + "/param_robosense_rs16.lua"
    p, _ = load_lua_parameters(f, search_dirs=[REF_PARAM_DIR])
    assert p.odometry.scan_processing.voxel_size == 0.2
    assert p.odometry.use_odometry_topic_instead_of_scan_to_scan is True
    assert p.mapper.submaps.max_num_points == 250000
    s2m = p.mapper.mapper_localizer.scan_to_map_registration
    assert s2m.scan_processing.scan_cropping.cropping_radius_max == 15.0
    assert s2m.reference_cloud_setting_period == 2.0  # lua: reference_cloud_seting_period
    assert p.mapper.map_initializer.init_pose.yaw == 120.0
    assert p.mapper.mapper_localizer.is_carving_enabled is False
