"""Stage entry point: ``python -m vcoder_tpu.train.vcoder_ds_train``.

reference: vcoder_llava/train/vcoder_ds_train* drivers + scripts/v1_5/.
"""

from vcoder_tpu.train.drivers import build_arg_parser, run_stage

if __name__ == "__main__":
    run_stage("vcoder_ds", build_arg_parser().parse_args())
