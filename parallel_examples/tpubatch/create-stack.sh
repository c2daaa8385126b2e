#!/bin/bash
# Create the GCP infrastructure for the tpubatch pipeline from
# template/main.tf. Analogue of the reference's create-stack.sh
# (reference: parallel_examples/awsbatch/create-stack.sh, which drives
# CloudFormation); here Terraform holds the state, so create and modify
# are the same operation (see modify-stack.sh).

set -euo pipefail

if [[ -z "${GCP_PROJECT:-}" ]]; then
    echo "Must set GCP_PROJECT first" >&2
    exit 1
fi
GCP_REGION="${GCP_REGION:-us-central1}"

cd "$(dirname "$0")/template"
terraform init -input=false
terraform apply -input=false \
    -var "project=${GCP_PROJECT}" -var "region=${GCP_REGION}" "$@"

echo
echo "Stack created. Next steps:"
echo "  1. make -C ..         # build + push the worker image"
echo "  2. submit_pyshepseg_job.py --backend gcpbatch ..."
