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
