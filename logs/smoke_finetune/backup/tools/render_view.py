"""Multi-path novel-view renderer (reference tools/render_view.py — the
variant of render.py where ALL five camera paths are active and the
default path is 'interpolation').

Thin wrapper over render.py's main with the tools/ defaults.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfart_tpu.utils.config import create_args_parser, load_config

if __name__ == "__main__":
    import render as render_cli

    parser = create_args_parser()
    parser.add_argument("--num_views", type=int, default=90)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--downscale", type=float, default=1)
    parser.add_argument("--rayschunk", type=int, default=4096)
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--camera_path", type=str, default="interpolation",
                        help="[spiral, interpolation, small_circle, "
                             "great_circle, spherical_spiral]")
    parser.add_argument("--camera_inds", type=str, default="11,15")
    parser.add_argument("--load_pt", type=str, default=None)
    parser.add_argument("--H", type=int, default=None)
    parser.add_argument("--H_scale", type=float, default=None)
    parser.add_argument("--W", type=int, default=None)
    parser.add_argument("--W_scale", type=float, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--disable_rgb", action="store_true")
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--alter_radiance", type=str, default=None)
    parser.add_argument("--outbase", type=str, default=None)
    parser.add_argument("--use_surface_render", type=str, default=None)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--rot_rad", type=float, default=0.3)
    parser.add_argument("--rot_percentile", type=int, default=85)
    parser.add_argument("--save_depth", type=bool, default=True)
    parser.add_argument("--save_normal", type=bool, default=True)
    cli_args, unknown = parser.parse_known_args()
    config = load_config(cli_args, unknown)
    render_cli.main_function(config)
