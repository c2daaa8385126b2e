# Infrastructure template for the pyshepseg_tpu batch pipeline on GCP —
# the analogue of the reference's CloudFormation template
# (parallel_examples/awsbatch/template/template.yaml: VPC + Batch compute
# environment + queue + job definitions for EC2 CPU workers).
#
# Creates: the object-store bucket (data plane), a worker service
# account with access to it, and an Artifact Registry repository for the
# worker image (parallel_examples/tpubatch/Dockerfile). Cloud Batch jobs
# themselves are submitted per scene by submit_pyshepseg_job.py
# --backend gcpbatch, which emits job specs that reference these
# resources and request TPU-VM machine types.
#
#   terraform init && terraform apply \
#       -var project=my-project -var region=us-central1

variable "project" { type = string }
variable "region" {
  type    = string
  default = "us-central1"
}
variable "bucket_name" {
  type        = string
  default     = ""
  description = "Object-store bucket; default derives from the project"
}

provider "google" {
  project = var.project
  region  = var.region
}

locals {
  bucket = var.bucket_name != "" ? var.bucket_name : "${var.project}-pyshepseg-tpu"
}

# Data plane: prepare.pkl, per-tile rasters, and final outputs
# (ObjectStore gs:///s3:///file:// — see objstore.py)
resource "google_storage_bucket" "store" {
  name                        = local.bucket
  location                    = var.region
  uniform_bucket_level_access = true
  force_destroy               = true

  lifecycle_rule {
    # tile intermediates are re-creatable from the source scene; expire
    # anything a failed job left behind
    condition { age = 14 }
    action { type = "Delete" }
  }
}

# Worker image registry
resource "google_artifact_registry_repository" "images" {
  repository_id = "pyshepseg-tpu"
  format        = "DOCKER"
  location      = var.region
}

# Identity the Batch jobs run as
resource "google_service_account" "worker" {
  account_id   = "pyshepseg-tpu-worker"
  display_name = "pyshepseg_tpu batch worker"
}

resource "google_storage_bucket_iam_member" "worker_rw" {
  bucket = google_storage_bucket.store.name
  role   = "roles/storage.objectAdmin"
  member = "serviceAccount:${google_service_account.worker.email}"
}

resource "google_project_iam_member" "worker_batch" {
  project = var.project
  role    = "roles/batch.agentReporter"
  member  = "serviceAccount:${google_service_account.worker.email}"
}

output "store_url" {
  value = "gs://${google_storage_bucket.store.name}"
}
output "image_repo" {
  value = "${var.region}-docker.pkg.dev/${var.project}/${google_artifact_registry_repository.images.repository_id}"
}
output "worker_service_account" {
  value = google_service_account.worker.email
}

# ---------------------------------------------------------------- fleet
# Worker-fleet resources: the analogue of the reference template's VPC +
# Batch compute environment (template.yaml Resources: VPC, SecurityGroup,
# ComputeEnvironment, JobQueue). GCP Batch carries the compute shape in
# each job's allocationPolicy instead of a persistent compute
# environment, so the durable pieces here are the network the jobs run
# in and an instance template capturing the TPU-VM worker shape that
# job specs reference by name.

variable "machine_type" {
  type        = string
  default     = "ct5lp-hightpu-1t"
  description = "TPU-VM machine type for tile workers (1 v5e chip)"
}

variable "max_workers" {
  type        = number
  default     = 64
  description = "Ceiling on concurrent tile tasks a submit may request"
}

resource "google_compute_network" "net" {
  name                    = "pyshepseg-tpu"
  auto_create_subnetworks = false
}

resource "google_compute_subnetwork" "subnet" {
  name                     = "pyshepseg-tpu-workers"
  network                  = google_compute_network.net.id
  region                   = var.region
  ip_cidr_range            = "10.10.0.0/16"
  # workers reach the object store via Google APIs without external IPs
  private_ip_google_access = true
}

# Batch jobs need no inbound access at all; allow only internal traffic
# (tile jobs are independent — this exists for debugging via IAP if a
# site adds the IAP range) and deny-by-default for everything else.
resource "google_compute_firewall" "internal" {
  name    = "pyshepseg-tpu-internal"
  network = google_compute_network.net.name

  allow {
    protocol = "tcp"
  }
  allow {
    protocol = "udp"
  }
  allow {
    protocol = "icmp"
  }
  source_ranges = [google_compute_subnetwork.subnet.ip_cidr_range]
}

# The worker shape: job specs submitted by submit_pyshepseg_job.py
# reference this template (allocationPolicy.instances.instanceTemplate),
# so the machine type / disk / scopes are administered here, not in
# every submit.
resource "google_compute_instance_template" "worker" {
  name_prefix  = "pyshepseg-tpu-worker-"
  machine_type = var.machine_type
  region       = var.region

  disk {
    source_image = "projects/debian-cloud/global/images/family/debian-12"
    auto_delete  = true
    boot         = true
    disk_size_gb = 100
  }

  network_interface {
    subnetwork = google_compute_subnetwork.subnet.id
    # no access_config block: workers carry no external IP; the object
    # store is reached through private Google access
  }

  service_account {
    email  = google_service_account.worker.email
    scopes = ["cloud-platform"]
  }

  scheduling {
    # tile jobs are idempotent (re-runnable from the object store), so
    # preemptible capacity is safe and much cheaper
    preemptible       = true
    automatic_restart = false
  }

  lifecycle {
    create_before_destroy = true
  }
}

output "network" {
  value = google_compute_network.net.id
}
output "subnetwork" {
  value = google_compute_subnetwork.subnet.id
}
output "instance_template" {
  value = google_compute_instance_template.worker.id
}
output "max_workers" {
  value = var.max_workers
}
