#!/bin/bash
# Evaluate every packed model in the cache (reference run_eval.py protocol:
# WikiText-2 ppl at every supported bit-width, merged into results.json).
TOKENIZER=${1:-meta-llama/Llama-3.1-8B-Instruct}
python run_eval.py --tokenizer "$TOKENIZER" --datasets wikitext2
