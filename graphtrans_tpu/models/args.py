"""Shared CLI argument groups for model components (mirrors the flag surface
of /root/reference/modules/transformer_encoder.py:10-20 and
masked_transformer_encoder.py:105-109, including defaults). Deviation: the
reference's --max_input_len lacks type=int (becomes str when set from YAML);
we fix the type."""


def add_transformer_args(parser):
    group = parser.add_argument_group("transformer")
    group.add_argument("--d_model", type=int, default=128, help="transformer d_model.")
    group.add_argument("--nhead", type=int, default=4, help="transformer heads")
    group.add_argument("--dim_feedforward", type=int, default=512,
                       help="transformer feedforward dim")
    group.add_argument("--transformer_dropout", type=float, default=0.3)
    group.add_argument("--transformer_activation", type=str, default="relu")
    group.add_argument("--num_encoder_layers", type=int, default=4)
    group.add_argument("--max_input_len", type=int, default=1000,
                       help="The max input length of transformer input")
    group.add_argument("--transformer_norm_input", action="store_true", default=False)


def add_masked_transformer_args(parser):
    group = parser.add_argument_group(
        "Masked Transformer Encoder -- architecture config"
    )
    group.add_argument("--num_encoder_layers_masked", type=int, default=0)
    group.add_argument("--transformer_prenorm", action="store_true", default=False)
