"""Entry point mirroring the reference script traj_ball_renderer.py (preset: traj_ball).

Same input/output folder conventions and frame schedule as the reference;
all knobs overridable via the unified CLI flags (cli.main).
"""

from pointcloud_render_tpu.cli import main as _main


def main(argv=None):
    _main.main(argv, preset_name="traj_ball")


if __name__ == "__main__":
    main()
