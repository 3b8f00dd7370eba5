#!/bin/bash
# Export a quantized model's integer weights + manifest (analog of the
# reference's executorch export, spin_quant/scripts/31_..._executorch.sh +
# convert_to_executorch.py).
# Usage: 31_export_int_weights.sh PACKED_MODEL_DIR OUT_DIR
set -e
MODEL_DIR=${1:?packed model dir}
OUT=${2:-export_out}
python - "$MODEL_DIR" "$OUT" <<'EOF'
import sys
from guidedquant_tpu.serve.model_api import QuantizedCausalLM
from guidedquant_tpu.formats.export import export_int_weights
lm = QuantizedCausalLM.from_quantized(sys.argv[1])
export_int_weights(lm.params, lm.cfg, sys.argv[2])
print("exported to", sys.argv[2])
EOF
