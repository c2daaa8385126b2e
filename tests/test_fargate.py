"""
Tests for the Fargate concurrency manager with a stubbed boto3 — the
cluster/task lifecycle (create, register, run, poll, exit-code check,
teardown) mirrors the reference's SegFargateMgr (reference:
pyshepseg/tiling.py:1616-1770) and must work without real AWS access.
"""

import sys
import types

import pytest

from pyshepseg_tpu import tiling


class FakeECS:
    def __init__(self, exitCodes=(0, 0)):
        self.calls = []
        self.exitCodes = exitCodes
        self.meta = types.SimpleNamespace(region_name="us-nowhere-1")

    def create_cluster(self, clusterName):
        self.calls.append(("create_cluster", clusterName))
        return {}

    def register_task_definition(self, **kwargs):
        self.calls.append(("register_task_definition", kwargs))
        return {"taskDefinition": {"taskDefinitionArn": "arn:taskdef/xyz"}}

    def run_task(self, **kwargs):
        self.calls.append(("run_task", kwargs))
        n = sum(1 for c in self.calls if c[0] == "run_task")
        return {"tasks": [{"taskArn": f"arn:task/{n}"}]}

    def describe_tasks(self, cluster, tasks):
        self.calls.append(("describe_tasks", cluster, tuple(tasks)))
        return {"tasks": [
            {"lastStatus": "STOPPED",
             "containers": [{"exitCode": rc}]}
            for rc in self.exitCodes[:len(tasks)]]}

    def deregister_task_definition(self, taskDefinition):
        self.calls.append(("deregister_task_definition", taskDefinition))

    def delete_cluster(self, cluster):
        self.calls.append(("delete_cluster", cluster))


class FakeChan:
    def addressStr(self):
        return "host,1234,abcd"


class FakeBarrier:
    def __init__(self):
        self.waited = False

    def wait(self, timeout=None):
        self.waited = True


def _make_mgr(monkeypatch, fake_ecs, numWorkers=2, logGroup=None):
    fake_boto3 = types.ModuleType("boto3")
    fake_boto3.client = lambda name: fake_ecs
    monkeypatch.setitem(sys.modules, "boto3", fake_boto3)

    fargateCfg = tiling.FargateConfig(
        containerImage="repo/image:latest",
        taskRoleArn="arn:role/task", executionRoleArn="arn:role/exec",
        subnet="subnet-1", securityGroups=["sg-1"],
        cpu="1024", memory="4096", cpuArchitecture="ARM64",
        cloudwatchLogGroup=logGroup)
    cfg = tiling.SegmentationConcurrencyConfig(
        concurrencyType=tiling.CONC_FARGATE, numWorkers=numWorkers,
        fargateCfg=fargateCfg, barrierTimeout=5)

    mgr = tiling.SegFargateMgr.__new__(tiling.SegFargateMgr)
    mgr.concurrencyCfg = cfg
    mgr.dataChan = FakeChan()
    mgr.workerBarrier = FakeBarrier()
    return mgr


def test_fargate_start_and_shutdown(monkeypatch):
    ecs = FakeECS()
    mgr = _make_mgr(monkeypatch, ecs, numWorkers=2)
    mgr.startWorkers()

    names = [c[0] for c in ecs.calls]
    assert names[:2] == ["create_cluster", "register_task_definition"]
    assert names.count("run_task") == 2
    assert mgr.workerBarrier.waited

    # task definition wired to the worker entry point
    reg = dict(ecs.calls[1][1])
    cdef = reg["containerDefinitions"][0]
    assert cdef["entryPoint"] == ["pyshepseg_tpu_segmentationworkercmd"]
    assert reg["runtimePlatform"]["cpuArchitecture"] == "ARM64"

    # each worker gets its id and the channel address
    runs = [c[1] for c in ecs.calls if c[0] == "run_task"]
    for i, kwargs in enumerate(runs):
        cmd = kwargs["overrides"]["containerOverrides"][0]["command"]
        assert cmd == ["--idnum", str(i), "--channaddr", "host,1234,abcd"]
        net = kwargs["networkConfiguration"]["awsvpcConfiguration"]
        assert net["subnets"] == ["subnet-1"]

    mgr.shutdown()
    names = [c[0] for c in ecs.calls]
    assert "describe_tasks" in names
    assert names[-2:] == ["deregister_task_definition", "delete_cluster"]


def test_fargate_reports_container_exit_code(monkeypatch, capsys):
    ecs = FakeECS(exitCodes=(0, 3))
    mgr = _make_mgr(monkeypatch, ecs, numWorkers=2)
    mgr.startWorkers()
    mgr.shutdown()
    err = capsys.readouterr().err
    assert "exited with 3" in err.replace("\n", " ")


def test_fargate_log_group_wiring(monkeypatch):
    ecs = FakeECS()
    mgr = _make_mgr(monkeypatch, ecs, numWorkers=1, logGroup="/my/group")
    mgr.startWorkers()
    reg = dict(ecs.calls[1][1])
    logconf = reg["containerDefinitions"][0]["logConfiguration"]
    assert logconf["logDriver"] == "awslogs"
    assert logconf["options"]["awslogs-group"] == "/my/group"
    assert logconf["options"]["awslogs-region"] == "us-nowhere-1"
    mgr.shutdown()


def test_fargate_requires_boto3(monkeypatch):
    monkeypatch.setitem(sys.modules, "boto3", None)
    mgr = tiling.SegFargateMgr.__new__(tiling.SegFargateMgr)
    with pytest.raises(tiling.PyShepSegTilingError):
        mgr.specificChecks()
