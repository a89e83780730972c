import numpy as np

from hercules_tpu.config import load_params, ConfigFile

SIMPLE_IN = "/root/reference/examples/simple/in"


def _params():
    return load_params(f"{SIMPLE_IN}/physics.in", f"{SIMPLE_IN}/numerical.in")


def test_simple_params():
    p = _params()
    assert p.freq == 5.0
    assert p.delta_t == 0.001
    assert p.total_steps == 20000
    assert p.vscut == 3400.0
    assert p.factor == 40.0
    assert p.region_length_east_m == 1000.0
    assert p.region_depth_deep_m == 500.0
    assert p.type_of_damping == "rayleigh"
    assert p.number_output_stations == 5
    assert p.stations.shape == (5, 3)
    np.testing.assert_allclose(p.stations[0], [500.0, 500.0, 100.0])
    assert p.output_mesh == 1
    assert p.use_checkpoint == 0


def test_terashake_params():
    p = load_params("/root/reference/examples/terashake/physics.in",
                    "/root/reference/examples/terashake/numerical.in")
    assert p.region_length_east_m == 600000.0
    assert p.region_length_north_m == 300000.0
    assert p.freq == 0.1
    assert p.delta_t == 0.02
    assert p.number_output_planes == 1
    assert p.planes.shape == (1, 9)


def test_source_config():
    c = ConfigFile(f"{SIMPLE_IN}/sourcefiles/source.in")
    assert c.get_string("type_of_source") == "srfh"
    assert c.get_int("number_of_poles") == 14
    assert c.get_double("threshold_frequency") == 4.5
    assert c.get_int("source_is_filtered") == 1
    assert c.get_string("source_function_type") == "discrete"
    corners = c.get_table("domain_surface_corners", 4, 2)
    np.testing.assert_allclose(corners[2], [1000.0, 1000.0])


def test_schedule_and_stat_keys(tmp_path):
    """psolve.c:785-801 optional key surface: schedule_print_*,
    stat_*_filename, stiffness_calculation_method."""
    import shutil
    from hercules_tpu.config import load_params
    S = "/root/reference/examples/simple"
    num = open(f"{S}/in/numerical.in").read() + (
        "\nschedule_print_file = 1\nschedule_print_error_check = 1\n"
        "schedule_print_stdout = 1\nstat_schedule_filename = ss.txt\n"
        "stat_mesh_filename = sm.txt\n"
        "stiffness_calculation_method = conventional\n")
    f = tmp_path / "numerical.in"
    f.write_text(num)
    p = load_params(f"{S}/in/physics.in", str(f))
    assert p.schedule_print_file == 1
    assert p.schedule_print_error_check == 1
    assert p.schedule_print_stdout == 1
    assert p.stat_schedule_filename == "ss.txt"
    assert p.stat_mesh_filename == "sm.txt"
    assert p.stiffness_method == "conventional"


def test_schedule_stats_error_check():
    from hercules_tpu.config import load_params
    from hercules_tpu.cvm import CVM
    from hercules_tpu.meshgen import generate_mesh
    from hercules_tpu.solver.bricks import build_plan
    from hercules_tpu.utils.stats import schedule_stats
    import io
    S = "/root/reference/examples/simple"
    p = load_params(f"{S}/in/physics.in", f"{S}/in/numerical.in")
    mesh = generate_mesh(p, CVM(f"{S}/simple_case.e"))
    plan = build_plan(mesh)
    buf = io.StringIO()
    assert schedule_stats(mesh, plan, out=buf, error_check=True)
    assert "error check: OK" in buf.getvalue()


def test_full_key_surface(tmp_path):
    """SURVEY §5 appendix: the parser accepts EVERY config key the
    reference parses (psolve.c:640-1058, output/planes/stations
    blocks, nonlinear.c:266-404, buildings.c:817-969, drm.c:218-313,
    meshformatlab.c:60-140), with the round-5 closers
    mesh_corners_matlab and drm_numberofelements included."""
    cfg = tmp_path / "parameters.in"
    cfg.write_text("""
region_origin_latitude_deg = 34.0
region_origin_longitude_deg = -118.0
region_depth_shallow_m = 0
region_length_east_m = 1000
region_length_north_m = 1000
region_depth_deep_m = 500
region_azimuth_leftface_deg = 0
type_of_damping = bkt
simulation_wave_max_freq_hz = 1.0
simulation_node_per_wavelength = 8
simulation_shear_velocity_min = 200
simulation_start_time_sec = 0
simulation_end_time_sec = 1.0
simulation_delta_time_sec = 0.01
softening_factor = 1.0
use_progressive_meshing = 1
simulation_output_rate = 5
simulation_velocity_profile_freq_hz = 0.5
the_threshold_damping = 0.05
the_threshold_Vp_over_Vs = 3.0
do_damping_statistics = 1
use_infinite_qk = no
stiffness_calculation_method = conventional
print_matrix_k = no
monitor_file = mon.txt
output_mesh = yes
enable_timing_barriers = yes
forces_buffer_size = 1000
schedule_print_file = 1
schedule_print_error_check = 1
schedule_print_stdout = 1
stat_schedule_filename = ss.txt
stat_mesh_filename = sm.txt
mesh_coordinates_for_matlab = yes
mesh_coordinates_directory_for_matlab = mdir
mesh_corners_matlab = 10 20 400 500 0 100
cvmdb_input_file = db.e
mesh_etree_output_file = mesh.e
use_checkpoint = 1
checkpointing_rate = 10
checkpoint_path = cp
output_parallel = yes
output_displacement = yes
output_velocity = yes
4D_output_file = out.q4d
output_displacement_file = d.q4d
output_velocity_file = v.q4d
output_stats_file = os.txt
output_debug = no
output_debug_file = dbg.txt
number_output_planes = 1
output_planes_print_rate = 2
output_planes_directory = planes
output_planes =
  34.0 -118.0 0 100 5 100 4 0 90
domain_surface_corners =
  -118.1 33.9
  -117.9 33.9
  -117.9 34.1
  -118.1 34.1
number_output_stations = 1
output_stations_print_rate = 1
output_stations_directory = stations
output_stations =
  34.0 -118.0 10.0
source_directory = src
source_directory_output = srctmp
include_nonlinear_analysis = no
include_buildings = no
implement_drm = yes
which_drm_part = part0
drm_directory = drmdir
drm_boundary =
  100 100 900 900 400
drm_edgesize = 50
drm_offset_x = 0
drm_offset_y = 0
drm_print_rate = 2
part1_delta_t = 0.01
""")
    p = load_params(str(cfg))
    assert p.type_of_damping == "bkt"
    assert p.step_meshing == 1
    np.testing.assert_allclose(p.mesh_corners_matlab,
                               [10, 20, 400, 500, 0, 100])
    assert p.mesh_coordinates_for_matlab == "yes"
    assert p.implement_drm == 1
    assert p.planes.shape == (1, 9)
    assert p.domain_surface_corners.shape == (4, 2)
    # DRM block parses through DRMConfig
    from hercules_tpu.drm import DRMConfig
    d = DRMConfig.parse(ConfigFile(str(cfg)))
    assert d.part == "part0"
    assert d.edgesize == 50.0
    assert (d.xmin, d.ymin, d.xmax, d.ymax, d.depth) == (
        100.0, 100.0, 900.0, 900.0, 400.0)


def test_drm_information_roundtrip(tmp_path):
    """drm_numberofelements (drm.c:679-684 write, :2451 parse): the
    part0 info record round-trips and the part2 sanity check enforces
    it."""
    import pytest
    from hercules_tpu.drm import DRMPlan, DRMConfig, write_info, \
        sanity_check
    plan = DRMPlan(cfg=DRMConfig(), elem_idx=np.arange(7),
                   mask_b=np.zeros((7, 8), bool),
                   node_ids=np.arange(30, dtype=np.int32),
                   node_coords=np.zeros((30, 3)),
                   elem_node_rows=np.zeros((7, 8), np.int32))
    write_info(str(tmp_path), plan)
    info = ConfigFile(str(tmp_path / "drm_information"))
    assert info.get_int("drm_numberofelements") == 7
    assert info.get_int("drm_numberofnodes") == 30
    sanity_check(str(tmp_path), plan)      # matching: passes
    plan2 = DRMPlan(cfg=DRMConfig(), elem_idx=np.arange(5),
                    mask_b=np.zeros((5, 8), bool),
                    node_ids=np.arange(30, dtype=np.int32),
                    node_coords=np.zeros((30, 3)),
                    elem_node_rows=np.zeros((5, 8), np.int32))
    with pytest.raises(RuntimeError, match="drm boundary has changed"):
        sanity_check(str(tmp_path), plan2)
