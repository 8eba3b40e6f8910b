"""LLaVA base-stage entry point: ``python -m vcoder_tpu.train.train``.

``--stage pretrain`` = adapter-only pretrain with the plain conversation
version; ``--stage full`` = full finetune (reference:
vcoder_llava/train/train.py + scripts/v1_5/{pretrain,finetune}.sh).
"""

from vcoder_tpu.train.drivers import build_arg_parser, run_stage

if __name__ == "__main__":
    parser = build_arg_parser()
    parser.add_argument(
        "--stage", type=str, default="full", choices=["pretrain", "full"]
    )
    args = parser.parse_args()
    if args.stage == "pretrain" and args.version == "v1":
        args.version = "plain"
    run_stage(args.stage, args)
