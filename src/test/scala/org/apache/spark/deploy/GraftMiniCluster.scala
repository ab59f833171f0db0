package org.apache.spark.deploy

import org.apache.spark.SparkConf
import org.apache.spark.deploy.master.Master
import org.apache.spark.deploy.worker.Worker
import org.apache.spark.rpc.RpcEnv

/** Two-HOST in-process standalone mini-cluster: master on 127.0.0.1,
  * one worker each on 127.0.0.1 and 127.0.0.2 (loopback aliases — one
  * machine, two host identities). Exists because `local-cluster[...]`
  * pins every worker to ONE hostname and the scheduler refuses to place
  * a speculative attempt on the original attempt's host
  * (TaskSetManager.dequeueSpeculativeTask's host exclusion), so
  * speculation can never fire on a single-host cluster — the
  * SpeculationProbe needs real distinct hosts. Lives under
  * org.apache.spark.deploy because Master/Worker are private[deploy];
  * test-scope only, never shipped. */
object GraftMiniCluster {

  private var envs: Seq[RpcEnv] = Nil

  /** Starts master + the two single-host workers; returns the master URL. */
  def start(coresPerWorker: Int, memMb: Int, workDirBase: String): String = {
    val conf = new SparkConf(false)
    val (masterEnv, _, _) = Master.startRpcEnvAndEndpoint("127.0.0.1", 0, 0, conf)
    val masterUrl = s"spark://127.0.0.1:${masterEnv.address.port}"
    val workers = Seq("127.0.0.1", "127.0.0.2").zipWithIndex.map { case (host, i) =>
      Worker.startRpcEnvAndEndpoint(host, 0, 0, coresPerWorker, memMb,
        Array(masterUrl), s"$workDirBase/worker${i + 1}", Some(i + 1), conf, None)
    }
    envs = masterEnv +: workers
    masterUrl
  }

  def stop(): Unit = { envs.foreach(_.shutdown()); envs = Nil }
}
